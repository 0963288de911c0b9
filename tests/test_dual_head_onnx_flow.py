"""Dedicated dual-head deployment flow (VERDICT round-2 item 8 / missing 5):
convert -> validate -> save-outputs, each driven through its CLI on a real
(tiny, synthetically trained) dual-head checkpoint (reference:
scripts/onnx_conversion/convert_dual_head_to_onnx.py,
validate_dual_head_onnx.py, save_dual_head_outputs.py)."""

import glob
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(script, *cli):
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'scripts', script)] + list(cli),
        capture_output=True, text=True, cwd=REPO, env=env, timeout=540)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


@pytest.fixture(scope='module')
def dual_head_ckpt(tmp_path_factory):
    """One-epoch synthetic training of the dual-head flagship, checkpointed."""
    tmp = tmp_path_factory.mktemp('dh_run')
    from packnet_sfm_tpu.config import parse_train_config
    from packnet_sfm_tpu.config.config import prepare_config
    from packnet_sfm_tpu.trainers.trainer import Trainer

    cfg = parse_train_config('configs/overfit_synthetic.yaml')
    cfg.arch.max_epochs = 1
    cfg.model.depth_net.use_dual_head = True
    cfg.model.depth_net.use_film = True
    # dual-head is supervised-only (no inv_depths for the photometric branch)
    cfg.model.loss.supervised_loss_weight = 1.0
    cfg.checkpoint.filepath = str(tmp / 'ckpts')
    cfg.checkpoint.monitor = 'loss'
    cfg.prepared = False
    cfg = prepare_config(cfg)
    Trainer(cfg).fit()
    ckpts = [os.path.join(root, f)
             for root, _, files in os.walk(str(tmp))
             for f in files if f.endswith('.ckpt')]
    assert ckpts, 'no checkpoint written'
    return ckpts[0]


def test_convert_composed(dual_head_ckpt, tmp_path):
    out = str(tmp_path / 'dh_composed.onnx')
    stdout = run('onnx_conversion/convert_dual_head_to_onnx.py',
                 '--checkpoint', dual_head_ckpt, '--output', out,
                 '--input_shape', '64', '96')
    assert 'composed depth range' in stdout
    # without the onnx package the export falls back to TorchScript
    written = glob.glob(str(tmp_path / 'dh_composed*'))
    assert written, 'no artifact written'
    assert 'exported' in stdout


def test_convert_separate_and_validate(dual_head_ckpt, tmp_path):
    out = str(tmp_path / 'dh_separate.onnx')
    stdout = run('onnx_conversion/convert_dual_head_to_onnx.py',
                 '--checkpoint', dual_head_ckpt, '--output', out,
                 '--input_shape', '64', '96', '--separate_outputs')
    assert 'integer range' in stdout
    artifacts = glob.glob(str(tmp_path / 'dh_separate*'))
    assert artifacts
    # validate the exported two-sigmoid graph against the jax forward
    stdout = run('onnx_conversion/validate_dual_head_onnx.py',
                 '--checkpoint', dual_head_ckpt,
                 '--artifact', artifacts[0],
                 '--input_shape', '64', '96', '--num_samples', '2',
                 '--tolerance', '1e-3')
    assert 'PASS' in stdout


def test_validate_in_process_mirror(dual_head_ckpt):
    stdout = run('onnx_conversion/validate_dual_head_onnx.py',
                 '--checkpoint', dual_head_ckpt,
                 '--input_shape', '64', '96', '--num_samples', '2',
                 '--tolerance', '1e-3')
    assert 'PASS' in stdout
    assert 'max errors' in stdout


def test_save_outputs_npz(dual_head_ckpt, tmp_path):
    out = str(tmp_path / 'outs')
    stdout = run('onnx_conversion/save_dual_head_outputs.py',
                 '--checkpoint', dual_head_ckpt, '--output_dir', out,
                 '--split', 'val', '--num_samples', '2')
    assert 'saved 2 samples' in stdout
    files = sorted(glob.glob(os.path.join(out, '*.npz')))
    assert len(files) == 2
    z = np.load(files[0])
    assert set(z.files) >= {'integer', 'fractional', 'depth', 'max_depth'}
    assert z['integer'].min() >= 0.0 and z['integer'].max() <= 1.0
    np.testing.assert_allclose(
        z['depth'], z['integer'] * z['max_depth'] + z['fractional'],
        rtol=1e-6, atol=1e-6)


def test_save_outputs_separate_dirs_int8(dual_head_ckpt, tmp_path):
    out = str(tmp_path / 'outs_int8')
    run('onnx_conversion/save_dual_head_outputs.py',
        '--checkpoint', dual_head_ckpt, '--output_dir', out,
        '--split', 'val', '--num_samples', '1', '--save_format', 'npy',
        '--save_separate_dirs', '--precision', 'int8',
        '--model_name', 'm0')
    for sub in ('integer_int8', 'fractional_int8', 'depth_int8'):
        files = glob.glob(os.path.join(out, 'm0', sub, '*.npy'))
        assert len(files) == 1, sub
    integer = np.load(glob.glob(
        os.path.join(out, 'm0', 'integer_int8', '*.npy'))[0])
    # int8 fake-quant: values land on the u8 grid
    np.testing.assert_allclose(integer * 255.0,
                               np.round(integer * 255.0), atol=1e-4)


def test_evaluate_unified_compare(dual_head_ckpt, tmp_path):
    """evaluate_unified --mode compare scores framework dumps and 'NPU'
    dumps on the SAME stems and reports the delta."""
    import json
    from PIL import Image
    rng = np.random.RandomState(3)
    imgs, gt, npu = tmp_path / 'imgs', tmp_path / 'gt', tmp_path / 'npu'
    for d in (imgs, gt, npu):
        d.mkdir()
    for i in range(2):
        stem = 'frame_{:03d}'.format(i)
        Image.fromarray((rng.rand(64, 96, 3) * 255).astype(np.uint8)).save(
            str(imgs / (stem + '.png')))
        depth = (rng.rand(64, 96) * 10 + 1).astype(np.float32)
        Image.fromarray((depth * 256).astype(np.uint16)).save(
            str(gt / (stem + '.png')))
        np.save(str(npu / (stem + '.npy')),
                depth * (1 + 0.05 * rng.randn(64, 96).astype(np.float32)))
    out_json = tmp_path / 'unified.json'
    stdout = run('evaluation/evaluate_unified.py', '--mode', 'compare',
                 '--checkpoint', dual_head_ckpt, '--images', str(imgs),
                 '--npu-dir', str(npu), '--gt', str(gt),
                 '--workdir', str(tmp_path / 'work'),
                 '--output-json', str(out_json))
    assert 'unified eval [compare] over 2 shared samples' in stdout
    data = json.loads(out_json.read_text())
    assert set(data) >= {'fp32', 'npu', 'delta'}
    assert data['npu']['count'] == 2
    # the 5%-perturbed 'NPU' dump is ~5% off GT regardless of the model
    assert 0.01 < data['npu']['abs_rel'] < 0.2


def test_generate_predictions_dual_head(dual_head_ckpt, tmp_path):
    """generate_predictions.py dumps per-head npy + composed depth npz from
    a dual-head checkpoint over a directory of images."""
    imgs = tmp_path / 'imgs'
    imgs.mkdir()
    from PIL import Image
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray((rng.rand(64, 96, 3) * 255).astype(np.uint8)).save(
            str(imgs / 'frame_{:03d}.png'.format(i)))
    out = str(tmp_path / 'preds')
    stdout = run('evaluation/generate_predictions.py',
                 '--checkpoint', dual_head_ckpt, '--images', str(imgs),
                 '--output', out, '--save', 'npz', 'png')
    assert 'wrote 2 predictions' in stdout
    npz = sorted(glob.glob(os.path.join(out, '*.npz')))
    assert len(npz) == 2
    depth = np.load(npz[0])['depth']
    integer = np.load(os.path.join(out, 'frame_000_integer.npy'))
    frac = np.load(os.path.join(out, 'frame_000_fractional.npy'))
    max_d = 15.0  # overfit_synthetic params.max_depth
    np.testing.assert_allclose(
        depth, (integer * max_d + frac)[..., 0], rtol=1e-5, atol=1e-5)


def test_generate_torch_predictions_match(dual_head_ckpt, tmp_path):
    """Torch-mirror dumps agree with framework dumps on the same images
    (reference: scripts/evaluation/generate_pytorch_predictions.py — the
    cross-pipeline prediction witness)."""
    from PIL import Image
    rng = np.random.RandomState(11)
    imgs = tmp_path / 'imgs'
    imgs.mkdir()
    for i in range(2):
        Image.fromarray((rng.rand(64, 96, 3) * 255).astype(np.uint8)).save(
            str(imgs / 'f_{:02d}.png'.format(i)))
    jax_out, torch_out = str(tmp_path / 'jax'), str(tmp_path / 'torch')
    run('evaluation/generate_predictions.py',
        '--checkpoint', dual_head_ckpt, '--images', str(imgs),
        '--output', jax_out)
    stdout = run('evaluation/generate_torch_predictions.py',
                 '--checkpoint', dual_head_ckpt, '--images', str(imgs),
                 '--output', torch_out)
    assert 'wrote 2 torch-mirror predictions' in stdout
    for i in range(2):
        a = np.load(os.path.join(jax_out, 'f_{:02d}.npz'.format(i)))['depth']
        b = np.load(os.path.join(
            torch_out, 'f_{:02d}.npz'.format(i)))['depth']
        assert a.shape == b.shape
        assert np.abs(a - b).max() < 1e-2, np.abs(a - b).max()


def test_infer_cli_dual_head(dual_head_ckpt, tmp_path):
    """infer.py composes dual-head outputs into metric depth instead of
    crashing on the missing 'inv_depths' key."""
    from PIL import Image
    rng = np.random.RandomState(21)
    img = tmp_path / 'in.png'
    Image.fromarray((rng.rand(64, 96, 3) * 255).astype(np.uint8)).save(
        str(img))
    out = str(tmp_path / 'preds')
    run('infer.py', '--checkpoint', dual_head_ckpt, '--input', str(img),
        '--output', out, '--save', 'npz', 'viz', '--device', 'cpu')
    d = np.load(os.path.join(out, 'in.npz'))['depth']
    assert d.shape == (64, 96) and np.isfinite(d).all() and (d > 0).all()
    assert os.path.exists(os.path.join(out, 'in_viz.png'))


def test_eval_save_outputs_dual_head(dual_head_ckpt, tmp_path):
    """cfg.save dump pass composes dual-head outputs into depth npz/viz."""
    import glob
    from packnet_sfm_tpu.config import parse_test_file
    from packnet_sfm_tpu.trainers.trainer import Trainer, _to_device_batch
    config, state = parse_test_file(dual_head_ckpt)
    config.datasets.test = config.datasets.validation.clone()
    config.save.folder = str(tmp_path / 'dumps')
    trainer = Trainer(config, resume_state=state)
    loader = trainer._make_loader('test')
    first = next(iter(loader))
    trainer._steps_per_epoch = 1
    trainer.setup(_to_device_batch(first, trainer.mesh))
    trainer.test(loader)
    npzs = glob.glob(str(tmp_path / 'dumps' / '**' / '*_depth.npz'),
                     recursive=True)
    assert npzs
    d = np.load(npzs[0])['depth']
    assert d.ndim == 2 and np.isfinite(d).all() and (d > 0).all()
