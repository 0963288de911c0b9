"""INT8 quantization simulation: dual-head must beat single-head by ~an
order of magnitude (the ST2 design rationale, docs/QUANTIZATION.md)."""

import numpy as np

from packnet_sfm_tpu.ops.quantization import (
    fake_quant_u8, quantization_error_report)


def test_fake_quant_levels():
    import jax.numpy as jnp
    x = jnp.asarray([0.0, 0.5, 1.0, 0.123])
    q = np.asarray(fake_quant_u8(x))
    assert set(np.round(q * 255).astype(int)) <= set(range(256))
    np.testing.assert_allclose(q[0], 0.0)
    np.testing.assert_allclose(q[2], 1.0)


def test_dual_head_beats_single_head():
    rep = quantization_error_report(min_depth=0.5, max_depth=15.0)
    # dual-head fractional step = 1/255 m -> max error ~1.96mm
    assert rep['dual_head']['max_mm'] < 3.0
    # single-head linear blows up at far range (reference: ~28mm+ steps)
    assert rep['single_linear']['max_mm'] > 20.0
    assert rep['dual_head']['max_mm'] < rep['single_linear']['max_mm'] / 5
    # log-space single head sits in between
    assert rep['single_log']['max_mm'] < rep['single_linear']['max_mm']
