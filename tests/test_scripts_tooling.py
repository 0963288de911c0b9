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
