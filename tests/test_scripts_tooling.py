"""Offline tooling surfaces (VERDICT round-1 item 9): npz->png converter,
resize tree, NPU-output eval, visualization panels — each driven through its
CLI exactly as a user would (reference: scripts/data_processing/,
scripts/evaluation/, scripts/visualization/)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(script, *cli):
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'scripts', script)] + list(cli),
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


@pytest.fixture
def tree(tmp_path):
    rng = np.random.RandomState(0)
    for sub in ('npz', 'gt', 'rgb', 'npu'):
        (tmp_path / sub).mkdir()
    for i in range(2):
        stem = 'img_{:03d}'.format(i)
        d = ((rng.rand(48, 64) * 10 + 1) *
             (rng.rand(48, 64) < 0.4)).astype(np.float32)
        np.savez(tmp_path / 'npz' / (stem + '.npz'), depth=d)
        Image.fromarray((d * 256).astype(np.uint16)).save(
            tmp_path / 'gt' / (stem + '.png'))
        Image.fromarray((rng.rand(48, 64, 3) * 255).astype(np.uint8)).save(
            tmp_path / 'rgb' / (stem + '.png'))
        np.save(tmp_path / 'npu' / (stem + '.npy'),
                d * (1 + 0.02 * rng.randn(48, 64).astype(np.float32)))
    return tmp_path


def test_convert_npz_to_png_roundtrip(tree):
    run('data_processing/convert_npz_to_png.py',
        '--input', str(tree / 'npz'), '--output', str(tree / 'png'))
    out = np.asarray(Image.open(tree / 'png' / 'img_000.png'),
                     np.float32) / 256.0
    ref = np.load(tree / 'npz' / 'img_000.npz')['depth']
    np.testing.assert_allclose(out, ref, atol=1 / 256.0)


def test_resize_images_tree(tree):
    run('data_processing/resize_images.py', '--input', str(tree / 'rgb'),
        '--output', str(tree / 'small'), '--shape', '24', '32')
    img = Image.open(tree / 'small' / 'img_000.png')
    assert img.size == (32, 24)
    # depth tree: sparse-preserving (16-bit stays 16-bit, no interpolation)
    run('data_processing/resize_images.py', '--input', str(tree / 'gt'),
        '--output', str(tree / 'gt_small'), '--shape', '24', '32', '--depth')
    d = np.asarray(Image.open(tree / 'gt_small' / 'img_000.png'))
    assert d.dtype == np.uint16 and d.shape == (24, 32)


def test_eval_npu_outputs(tree):
    out_json = tree / 'eval.json'
    stdout = run('evaluation/eval_npu_outputs.py',
                 '--pred-dir', str(tree / 'npu'), '--gt-dir', str(tree / 'gt'),
                 '--kind', 'depth', '--min-depth', '0.5',
                 '--max-depth', '15', '--output-json', str(out_json))
    assert 'NPU eval (2 images' in stdout
    data = json.loads(out_json.read_text())
    assert 0 < data['mean']['abs_rel'] < 0.1  # 2% perturbation
    assert data['mean']['a1'] > 0.99


def test_visualize_depth_panels(tree):
    run('visualization/visualize_depth.py',
        '--image', str(tree / 'rgb' / 'img_000.png'),
        '--pred', str(tree / 'npz' / 'img_000.npz'),
        '--gt', str(tree / 'gt' / 'img_000.png'),
        '--output', str(tree / 'viz.png'))
    img = np.asarray(Image.open(tree / 'viz.png'))
    assert img.shape == (48, 64 * 4, 3)  # rgb | pred | overlay | err


def test_compare_predictions(tree):
    stdout = run('visualization/compare_predictions.py',
                 '--a', str(tree / 'npz'), '--b', str(tree / 'npu'),
                 '--images', str(tree / 'rgb'), '--gt', str(tree / 'gt'),
                 '--output', str(tree / 'cmp'), '--labels', 'FP32', 'NPU')
    assert '2 comparison panels' in stdout
    assert (tree / 'cmp' / 'img_000_cmp.png').exists()


def test_visualize_triptych(tree):
    stdout = run('visualization/visualize_triptych.py',
                 '--a', str(tree / 'npz'), '--b', str(tree / 'npu'),
                 '--gt', str(tree / 'gt'), '--images', str(tree / 'rgb'),
                 '--output', str(tree / 'tri'), '--labels', 'FP32', 'NPU',
                 '--max-depth', '15')
    assert '2 panels' in stdout
    img = np.asarray(Image.open(tree / 'tri' / 'img_000_triptych.png'))
    assert img.shape == (48 * 3, 64 * 3, 3)  # rgb row + 2x3 panel grid
    assert (tree / 'tri' / 'index.html').exists()
    # worst-N by B's abs_rel renders only the single worst image
    stdout = run('visualization/visualize_triptych.py',
                 '--a', str(tree / 'npz'), '--b', str(tree / 'npu'),
                 '--gt', str(tree / 'gt'),
                 '--output', str(tree / 'tri1'), '--worst', '1',
                 '--rank-by', 'b', '--max-depth', '15')
    assert '1 panels' in stdout
    assert len(list((tree / 'tri1').glob('*_triptych.png'))) == 1


def test_generate_luts(tree):
    out = str(tree / 'luts.npz')
    stdout = run('data_processing/generate_luts.py',
                 '--output', out, '--height', '96', '--width', '160')
    assert 'ray LUT 96x160x3' in stdout
    lut = np.load(out)
    rays = lut['ray_lut']
    assert rays.shape == (96, 160, 3)
    # unit rays
    np.testing.assert_allclose(np.linalg.norm(rays, axis=-1), 1.0, atol=1e-5)
    # inverse table really inverts the forward polynomial
    theta, rd = lut['theta_samples'], lut['rd_samples']
    assert len(theta) == len(rd) and (np.diff(rd) > 0).all()
    k = lut['k']
    rd_check = np.full_like(theta, k[6])
    for i in range(5, -1, -1):
        rd_check = rd_check * theta + k[i]
    np.testing.assert_allclose(rd_check, rd, atol=1e-5)


def test_build_test_set(tree):
    import json
    split = [{'new_filename': 'scene/img_000'}, {'new_filename': 'img_001'},
             {'new_filename': 'img_999'}]  # 999 is missing everywhere
    (tree / 'split.json').write_text(json.dumps(split))
    stdout = run('data_processing/build_test_set.py',
                 '--split', str(tree / 'split.json'),
                 '--source', 'rgb=' + str(tree / 'rgb'),
                 '--source', 'gt=' + str(tree / 'gt'),
                 '--output', str(tree / 'fin'))
    assert 'rgb: 2/3 copied (1 missing)' in stdout
    assert (tree / 'fin' / 'rgb' / 'img_000.png').exists()
    assert (tree / 'fin' / 'gt' / 'img_001.png').exists()
    manifest = json.loads((tree / 'fin' / 'manifest.json').read_text())
    assert manifest['kinds']['gt']['missing'] == ['img_999']


def test_make_viz_index(tree):
    stdout = run('visualization/make_viz_index.py',
                 '--dir', str(tree), '--title', 'fin test')
    assert 'index.html' in stdout
    page = (tree / 'index.html').read_text()
    assert 'fin test' in page and 'img_000.png' in page
    # groups by subdirectory
    assert 'rgb' in page and 'gt' in page


def test_lidar_vs_pred(tree):
    stdout = run('visualization/lidar_vs_pred.py',
                 '--pred', str(tree / 'npz' / 'img_000.npz'),
                 '--gt', str(tree / 'gt' / 'img_000.png'),
                 '--image', str(tree / 'rgb' / 'img_000.png'),
                 '--output', str(tree / 'lvp'), '--max_depth', '15')
    assert 'abs_rel' in stdout
    assert (tree / 'lvp' / 'img_000_overlay.png').exists()
    assert (tree / 'lvp' / 'img_000_scatter.png').exists()


def test_visualize_masked_prediction(tree):
    mask = np.zeros((48, 64), np.uint8)
    mask[:, 8:56] = 255  # fisheye-style border occlusion
    Image.fromarray(mask).save(tree / 'mask.png')
    stdout = run('visualization/visualize_masked_prediction.py',
                 '--image', str(tree / 'rgb' / 'img_000.png'),
                 '--pred', str(tree / 'npz' / 'img_000.npz'),
                 '--mask', str(tree / 'mask.png'),
                 '--output', str(tree / 'masked.png'))
    assert 'masked region: 75' in stdout
    img = np.asarray(Image.open(tree / 'masked.png'))
    assert img.shape == (48, 64 * 3, 3)  # rgb | raw | masked


@pytest.fixture
def ncdb_roots(tmp_path):
    """Two mini NCDB capture roots + two indoor loop folders."""
    rng = np.random.RandomState(7)
    roots = []
    for name in ('capture_a', 'capture_b',
                 'loop_01_640x384_newest', 'loop_02_640x384_newest'):
        root = tmp_path / name
        (root / 'image_a6').mkdir(parents=True)
        (root / 'newest_depth_maps').mkdir()
        for i in range(5):
            stem = '{}_{:03d}'.format(name, i)
            Image.fromarray((rng.rand(24, 32, 3) * 255).astype(
                np.uint8)).save(root / 'image_a6' / (stem + '.png'))
            depth = ((rng.rand(24, 32) * 10 + 1) * 256).astype(np.uint16)
            Image.fromarray(depth).save(
                root / 'newest_depth_maps' / (stem + '.png'))
        roots.append(root)
    return tmp_path, roots


def test_create_combined_splits(ncdb_roots):
    tmp, roots = ncdb_roots
    out = tmp / 'splits'
    run('data_processing/create_combined_splits.py',
        '--datasets', str(roots[0]), str(roots[1]),
        '--output', str(out), '--ratio', '0.6', '0.2', '0.2', '--seed', '3')
    splits = {n: json.load(open(out / n)) for n in
              ('combined_train.json', 'combined_val.json',
               'combined_test.json')}
    assert len(splits['combined_train.json']) == 6  # int(10 * 0.6)
    all_entries = [tuple(sorted(e.items())) for s in splits.values()
                   for e in s]
    assert len(all_entries) == 10 and len(set(all_entries)) == 10
    entry = splits['combined_train.json'][0]
    assert set(entry) == {'dataset_root', 'new_filename'}
    # entries load through the NcdbDataset split parser
    from packnet_sfm_tpu.datasets.ncdb import NcdbDataset
    ds = NcdbDataset(path=str(tmp), split=str(out / 'combined_train.json'),
                     depth_type='depth', strict_depth=True)
    s = ds[0]
    assert s['rgb'].shape == (24, 32, 3) and s['depth'].shape == (24, 32, 1)


def test_create_combined_indoor_splits(ncdb_roots):
    tmp, roots = ncdb_roots
    out = tmp / 'indoor_splits'
    run('data_processing/create_combined_indoor_splits.py',
        '--root', str(tmp), '--output', str(out))
    train = json.load(open(out / 'combined_train.json'))
    # only the two loop_* folders participate
    assert all('loop_' in e['dataset_root'] for e in train)
    total = sum(len(json.load(open(out / n))) for n in
                ('combined_train.json', 'combined_val.json',
                 'combined_test.json'))
    assert total == 10


def test_create_ncdb_metadata(ncdb_roots):
    tmp, roots = ncdb_roots
    out = tmp / 'splits'
    run('data_processing/create_combined_splits.py',
        '--datasets', str(roots[0]), '--output', str(out))
    stdout = run('data_processing/create_ncdb_metadata.py',
                 '--dataset_root', str(tmp),
                 '--split_file', str(out / 'combined_train.json'),
                 '--output', str(tmp / 'meta.csv'))
    assert 'samples:' in stdout
    import csv as _csv
    with open(tmp / 'meta.csv') as f:
        rows = list(_csv.DictReader(f))
    assert rows and rows[0]['depth_variant'] == 'newest_depth_maps'
    r = rows[0]
    assert 1.0 <= float(r['mean_depth']) <= 11.5
    assert int(r['width']) == 32 and int(r['height']) == 24
    assert r['scene_type'] in ('indoor', 'outdoor_near', 'outdoor_far')
    assert float(r['p90']) >= float(r['p50'])


def test_calibration_split(tmp_path):
    """calib subcommand: depth-stratified sampling from a metadata CSV."""
    import csv as _csv
    meta = tmp_path / 'meta.csv'
    rng = np.random.RandomState(0)
    with open(meta, 'w', newline='') as f:
        w = _csv.DictWriter(f, fieldnames=['new_filename', 'dataset_root',
                                           'mean_depth'])
        w.writeheader()
        for i in range(200):
            w.writerow({'new_filename': 'f{:04d}'.format(i),
                        'dataset_root': 'sceneA',
                        'mean_depth': float(rng.rand() * 30)})
    out = tmp_path / 'calib.json'
    stdout = run('data_processing/create_splits.py', 'calib',
                        '--metadata', str(meta), '--out', str(out),
                        '--target_size', '40')
    assert 'calibration samples' in stdout
    entries = json.loads(out.read_text())
    assert 0 < len(entries) <= 40
    assert all('new_filename' in e and 'dataset_root' in e for e in entries)


def _write_ascii_pcd(path, pts):
    with open(path, 'w') as f:
        f.write('# .PCD v0.7\nVERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\n'
                'TYPE F F F\nCOUNT 1 1 1\nWIDTH {n}\nHEIGHT 1\n'
                'POINTS {n}\nDATA ascii\n'.format(n=len(pts)))
        for p in pts:
            f.write('{:.4f} {:.4f} {:.4f}\n'.format(*p))


def test_pcd_depth_pipeline(tmp_path):
    """Integrated PCD -> GT pipeline: road rings synthesized from the
    ground band, merged + synthetic-only depth maps and a resized mirror
    (reference: scripts/refrence_code/integrated_pcd_depth_pipeline_newest.py)."""
    rng = np.random.RandomState(7)
    pcd_dir = tmp_path / 'pcd'
    pcd_dir.mkdir()
    # road plane behind the car (x<0, z~-1.5) + a wall at x=-8
    n = 400
    ground = np.stack([-(rng.rand(n) * 8 + 2),
                       rng.randn(n) * 2.0,
                       -1.5 + rng.rand(n) * 0.2], 1)
    wall = np.stack([np.full(60, -8.0), rng.randn(60),
                     rng.rand(60) * 2 + 0.5], 1)
    _write_ascii_pcd(pcd_dir / 'frame_000.pcd',
                     np.concatenate([ground, wall]))
    out = run('data_processing/pcd_depth_pipeline.py',
              '--input', str(tmp_path), '--image_size', '640', '512',
              '--resized', '320', '256', '--viz', '--xy_sep', '0.05')
    assert 'pipeline done: 1 clouds' in out

    merged_npz = np.load(tmp_path / 'newest_pcd' / 'frame_000.npz')
    n_orig = int(merged_npz['n_original'])
    assert merged_npz['points'].shape[0] > n_orig        # rings were added
    assert merged_npz['closest_line'].shape[0] > 10      # azimuth coverage

    depth = np.asarray(Image.open(
        tmp_path / 'newest_depth_maps' / 'frame_000.png'),
        np.float32) / 256.0
    synth = np.asarray(Image.open(
        tmp_path / 'newest_synthetic_depth_maps' / 'frame_000.png'),
        np.float32) / 256.0
    assert depth.shape == (512, 640)
    assert (synth > 0).sum() > 0
    # merged = original + synthetic: strictly more coverage than synth alone
    assert (depth > 0).sum() > (synth > 0).sum()
    # synthetic road points are below the horizon in a forward fisheye view
    assert (synth > 0).any(axis=1).argmax() > 100

    small = np.asarray(Image.open(
        tmp_path / '320x256_newest' / 'newest_depth_maps' /
        'frame_000.png'), np.float32) / 256.0
    assert small.shape == (256, 320) and (small > 0).sum() > 0
    assert (tmp_path / 'newest_colormap' /
            'frame_000_colorized.png').exists()


def test_pcd_pipeline_closest_line_unit():
    """closest_line keeps exactly the nearest 3D point per azimuth bin."""
    sys.path.insert(0, os.path.join(REPO, 'scripts', 'data_processing'))
    from pcd_depth_pipeline import closest_line, synth_road_rings
    # two points in the same azimuth (y=0-), different range
    pts = np.array([[-3.0, -0.001, -1.0],
                    [-6.0, -0.002, -1.0],
                    [-4.0, 3.0, -1.0]])
    line = closest_line(pts, z_range=(-3, 0), xy_dist=(1.0, 10.0))
    assert line.shape[0] == 2
    assert any(np.allclose(r, [-3.0, -0.001, -1.0]) for r in line)
    assert not any(np.allclose(r, [-6.0, -0.002, -1.0]) for r in line)
    # rings: anchored to the closest |y|<=band point, all x<=0, radii
    # bounded by the anchor range
    rings = synth_road_rings(pts, y_band=0.01, center_z=-1.0, n_radii=5,
                             circle_segs=64)
    assert rings.shape[0] > 0 and (rings[:, 0] <= 0).all()
    anchor_range = np.linalg.norm(pts[0] - np.array([0, 0, -1.0]))
    assert np.linalg.norm(rings - [0, 0, -1.0], axis=1).max() \
        <= anchor_range + 1e-6


def test_project_lidar_ncdb(tmp_path):
    """LiDAR -> depth-PNG projection in the offline GT convention: road
    points land below the vertical midline, wall points above, and stored
    values equal forward distance Xc (reference:
    scripts/refrence_code/ref_camera_lidar_projector.py)."""
    rng = np.random.RandomState(1)
    lidar = tmp_path / 'synced_data' / 'lidar'
    imgs = tmp_path / 'synced_data' / 'image_a6'
    lidar.mkdir(parents=True)
    imgs.mkdir()
    ground = np.stack([-(rng.rand(300) * 8 + 2), rng.randn(300) * 2.0,
                       -1.5 + rng.rand(300) * 0.2], 1)
    wall = np.stack([np.full(50, -8.0), rng.randn(50) * 0.5,
                     rng.rand(50) * 1.5 + 1.0], 1)
    np.savez(lidar / '000001.npz',
             points=np.concatenate([ground, wall]).astype(np.float32))
    Image.fromarray(np.zeros((768, 960, 3), np.uint8)).save(
        imgs / '000001.png')
    out = run('data_processing/project_lidar_ncdb.py',
              '--root', str(tmp_path), '--lidar_dir', 'synced_data/lidar',
              '--image_dir', 'synced_data/image_a6',
              '--out_folder', 'depth_out')
    assert 'projected 1 clouds' in out
    depth = np.asarray(Image.open(
        tmp_path / 'synced_data' / 'depth_out' / '000001.png'),
        np.float32) / 256.0
    assert depth.shape == (768, 960)
    v_valid, _ = np.nonzero(depth > 0)
    assert v_valid.size > 100
    # road points dominate: the valid-pixel band sits in the lower 2/3
    assert np.median(v_valid) > 768 / 3
    # stored depth is forward distance: bounded by the cloud's x-range + margin
    assert 1.5 < depth[depth > 0].min() and depth.max() < 12.0


def test_video_projection(tmp_path):
    """Video projection overlay: per-frame cloud + prediction panels and an
    assembled mp4 (reference:
    scripts/visualization/visualize_ncdb_video_projection.py)."""
    rng = np.random.RandomState(5)
    imgs, clouds, preds = (tmp_path / d for d in ('rgb', 'lidar', 'pred'))
    for d in (imgs, clouds, preds):
        d.mkdir()
    for i in range(3):
        stem = 'fr_{:03d}'.format(i)
        Image.fromarray((rng.rand(96, 128, 3) * 255).astype(np.uint8)).save(
            str(imgs / (stem + '.png')))
        ground = np.stack([-(rng.rand(200) * 8 + 2), rng.randn(200) * 2.0,
                           -1.5 + rng.rand(200) * 0.2], 1)
        np.savez(str(clouds / (stem + '.npz')),
                 points=ground.astype(np.float32))
        np.save(str(preds / (stem + '.npy')),
                (rng.rand(96, 128) * 10 + 1).astype(np.float32))
    out = run('visualization/video_projection.py',
              '--images', str(imgs), '--clouds', str(clouds),
              '--pred', str(preds), '--output', str(tmp_path / 'panels'),
              '--video', str(tmp_path / 'seq.mp4'), '--fps', '5')
    assert 'rendered 3 frame panels' in out
    panel = np.asarray(Image.open(tmp_path / 'panels' / 'fr_000.png'))
    assert panel.shape == (96, 256, 3)  # two side-by-side panels
    assert (tmp_path / 'seq.mp4').stat().st_size > 0


def test_offline_vadas_projection_golden():
    """vadas_project_offline against an independent scalar re-derivation of
    the offline camera math (reference:
    scripts/refrence_code/integrated_pcd_depth_pipeline_newest.py:398-425)
    and rodrigues_to_mat against cv2.Rodrigues."""
    import math
    sys.path.insert(0, os.path.join(REPO, 'scripts', 'data_processing'))
    from project_lidar_ncdb import rodrigues_to_mat, vadas_project_offline

    intr = np.array([-0.0004, 1.0136, -0.0623, 0.2852, -0.332, 0.1896,
                     -0.0391, 1.0447, 0.0021, 44.9516, 2.48822], np.float64)
    rng = np.random.RandomState(0)
    cam = rng.randn(200, 3) * np.array([5.0, 3.0, 2.0]) + \
        np.array([6.0, 0.0, 0.0])  # mostly in front (+X forward)
    W, H = 1920, 1536
    u, v, z, valid = vadas_project_offline(cam, intr, W, H)

    k, s, div, ux, uy = intr[:7], intr[7], intr[8], intr[9], intr[10]
    n_checked = 0
    for i in range(cam.shape[0]):
        Xc, Yc, Zc = cam[i]
        nx, ny = -Yc, -Zc
        dist = max(math.hypot(nx, ny), 1e-12)
        theta = math.atan2(dist, Xc)
        xd = theta * s
        rd = sum(float(k[j]) * xd ** j for j in range(7)) / div
        ue = rd * (nx / dist) + ux + W / 2
        ve = rd * (ny / dist) + uy + H / 2
        inside = Xc > 0 and 0 <= round(ue) < W and 0 <= round(ve) < H
        assert bool(valid[i]) == inside
        if inside:
            assert u[i] == round(ue) and v[i] == round(ve)
            assert abs(z[i] - Xc) < 1e-9
            n_checked += 1
    assert n_checked > 50  # the scene layout keeps most points projectable

    import cv2
    rvec = np.array([0.00100918, -0.236104, -0.0219886])
    R_cv, _ = cv2.Rodrigues(rvec)
    assert np.allclose(rodrigues_to_mat(rvec), R_cv, atol=1e-12)


def test_overfit_selfsup_ab_verdict(tmp_path):
    """compute_verdict gates on the trajectory tail + GT metric parity,
    not the single-endpoint loss (scripts/overfit_selfsup_ab.py); the
    --reverdict CLI recomputes in place."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'overfit_selfsup_ab',
        os.path.join(REPO, 'scripts', 'overfit_selfsup_ab.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    f32 = {'converged': True, 'loss_last': 0.02,
           'trajectory': {'loss': [0.2, 0.05, 0.04, 0.02]},
           'final_val_metrics': {'depth_gt-abs_rel': 0.14}}
    bf16 = {'converged': True, 'loss_last': 0.03,
            'trajectory': {'loss': [0.2, 0.06, 0.03, 0.03]},
            'final_val_metrics': {'depth_gt-abs_rel': 0.1401}}
    v = mod.compute_verdict(f32, bf16)
    # endpoint gap is 50% but the tail tracks and metrics match
    assert v['final_loss_rel_gap'] == 0.5
    assert v['bf16_tracks_fp32'] and v['default_justified']

    # a real quality regression (abs_rel 0.14 -> 0.30) must fail the gate
    bad = dict(bf16, final_val_metrics={'depth_gt-abs_rel': 0.30})
    assert not mod.compute_verdict(f32, bad)['default_justified']

    # diverged tail must fail even with matching metrics
    div = dict(bf16, trajectory={'loss': [0.2, 0.3, 0.4, 0.5]},
               converged=False)
    assert not mod.compute_verdict(f32, div)['default_justified']

    art = tmp_path / 'ab.json'
    art.write_text(json.dumps(
        {'verdict': {}, 'epochs': 4, 'float32': f32, 'bfloat16': bf16}))
    rc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'scripts',
                                      'overfit_selfsup_ab.py'),
         '--reverdict', str(art)], capture_output=True, text=True)
    assert rc.returncode == 0, rc.stderr
    assert json.loads(art.read_text())['verdict']['default_justified']
