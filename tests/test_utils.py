"""Utility tests: partial loader, viz colormap, top-k checkpoint monitor."""

import pytest

import numpy as np

import jax.numpy as jnp

from packnet_sfm_tpu.utils.load import load_network
from packnet_sfm_tpu.utils.viz import viz_inv_depth
from packnet_sfm_tpu.utils.checkpoint import ModelCheckpoint

pytestmark = pytest.mark.quick



def test_load_network_partial_merge():
    init = {'encoder': {'conv': {'kernel': np.zeros((3, 3, 3, 8))}},
            'decoder': {'conv': {'kernel': np.zeros((3, 3, 8, 1))}}}
    saved = {'encoder': {'conv': {'kernel': np.ones((3, 3, 3, 8))}},
             'decoder': {'conv': {'kernel': np.ones((1, 1, 8, 1))}}}  # shape mismatch
    merged, loaded, total = load_network(init, saved, verbose=False)
    assert loaded == 1 and total == 2
    assert float(jnp.sum(merged['encoder']['conv']['kernel'])) > 0
    assert float(np.sum(merged['decoder']['conv']['kernel'])) == 0


def test_load_network_prefix_tolerance():
    init = {'conv': {'kernel': np.zeros((3, 3))}}
    saved = {'model': {'conv': {'kernel': np.ones((3, 3))}}}
    merged, loaded, _ = load_network(init, saved, verbose=False)
    assert loaded == 1


def test_viz_inv_depth():
    inv = np.random.RandomState(0).rand(16, 24).astype(np.float32)
    img = viz_inv_depth(inv)
    assert img.shape == (16, 24, 3)
    assert img.min() >= 0 and img.max() <= 1
    # near (high inv depth) should differ in color from far
    assert not np.allclose(img[np.unravel_index(inv.argmax(), inv.shape)],
                           img[np.unravel_index(inv.argmin(), inv.shape)])


class _FakeState:
    """Minimal TrainState stand-in for checkpoint tests."""
    params = {'w': np.zeros(3)}
    batch_stats = {}
    opt_state = {}
    step = 0
    epoch = 0


def test_checkpoint_topk_eviction(tmp_path):
    from packnet_sfm_tpu.config import get_cfg_defaults
    cfg = get_cfg_defaults()
    cb = ModelCheckpoint(str(tmp_path / '{epoch:02d}_{abs_rel:.3f}'),
                         monitor='abs_rel', save_top_k=2, mode='auto')
    assert cb.mode == 'min'
    import os
    for epoch, val in enumerate([0.5, 0.3, 0.4, 0.2]):
        cb.check_and_save(cfg, _FakeState(), {'abs_rel': val}, epoch)
    ckpts = sorted(f for f in os.listdir(str(tmp_path)) if f.endswith('.ckpt'))
    assert len(ckpts) == 2
    # best two survive: 0.2 and 0.3
    assert any('0.200' in c for c in ckpts)
    assert any('0.300' in c for c in ckpts)


def test_checkpoint_mode_auto_max():
    cb = ModelCheckpoint('/tmp/x/{epoch}', monitor='depth-a1', mode='auto')
    assert cb.mode == 'max'


def test_save_code_snapshot(tmp_path):
    """code.tar.gz snapshot (reference model_checkpoint.py:19-21) scopes to
    framework sources and skips caches/artifacts."""
    import tarfile
    from packnet_sfm_tpu.utils.checkpoint import save_code
    out = save_code(str(tmp_path))
    with tarfile.open(out) as tar:
        names = tar.getnames()
    assert any(n.startswith('packnet_sfm_tpu/') for n in names)
    assert any(n.startswith('configs/') for n in names)
    assert not any('__pycache__' in n or n.endswith(('.pyc', '.ckpt'))
                   for n in names)


def test_depth_colormap_matplotlib_parity():
    """The numpy piecewise-linear metric-depth colormap must match a
    matplotlib LinearSegmentedColormap built from the same stops
    (reference: visualization/colormaps.py:83-141) at sampled positions,
    including the range-clamp/boundary-insertion semantics."""
    import numpy as np
    import pytest
    from packnet_sfm_tpu.utils.viz import (
        depth_cmap_stops, depth_colormap_lut, viz_depth_metric)
    mpl = pytest.importorskip('matplotlib.colors')

    for lo, hi in ((0.1, 15.0), (0.5, 10.0), (1.0, 4.0), (0.01, 20.0)):
        pos, cols = depth_cmap_stops(lo, hi)
        ref = mpl.LinearSegmentedColormap.from_list(
            'ref', list(zip(pos, [tuple(c) for c in cols])), N=512)
        lut = depth_colormap_lut(lo, hi, n=512)
        xs = np.linspace(0, 1, 512)
        want = np.array([ref(float(x))[:3] for x in xs], np.float32)
        # from_list quantizes to N bins; sampling the LUT at the same N
        # grid keeps the comparison on bin centers
        assert np.abs(lut - want).max() < 5e-3

    # rendering semantics: near=red, far=blue, invalid=black, clip to range
    d = np.array([[0.0, 0.1], [7.0, 15.0]], np.float32)
    rgb = viz_depth_metric(d, 0.1, 15.0)
    assert np.allclose(rgb[0, 0], 0.0)               # invalid -> black
    assert rgb[0, 1, 0] > 0.9 and rgb[0, 1, 2] < 0.1  # near -> red
    assert rgb[1, 1, 2] > 0.9 and rgb[1, 1, 0] < 0.1  # far -> blue


def test_depth_colormap_errors():
    import pytest
    from packnet_sfm_tpu.utils.viz import depth_cmap_stops, colormap_by_name
    with pytest.raises(ValueError):
        depth_cmap_stops(5.0, 5.0)
    with pytest.raises(ValueError):
        colormap_by_name('viridis')
    assert colormap_by_name('depth') is not None
