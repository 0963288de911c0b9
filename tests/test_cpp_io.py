"""Native PNG decoder parity tests (skipped when the toolchain is absent)."""

import numpy as np
import pytest
from PIL import Image

from packnet_sfm_tpu.datasets import cpp_io

pytestmark = pytest.mark.quick



@pytest.fixture(scope='module')
def lib_ok():
    if cpp_io._load() is None:
        pytest.skip('native pngio library unavailable')
    return True


def test_decode_rgb_matches_pil(tmp_path, lib_ok):
    rgb = (np.random.RandomState(0).rand(37, 53, 3) * 255).astype(np.uint8)
    p = str(tmp_path / 'x.png')
    Image.fromarray(rgb).save(p)
    got = cpp_io.decode_png(p)
    np.testing.assert_array_equal(got, rgb)


def test_decode_16bit_depth(tmp_path, lib_ok):
    d16 = (np.random.RandomState(1).rand(40, 60) * 20 * 256).astype(np.uint16)
    p = str(tmp_path / 'd.png')
    # write a true 16-bit gray PNG
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        Image.fromarray(d16, mode='I;16').save(p)
    got = cpp_io.decode_png16(p)
    np.testing.assert_array_equal(got, d16)


def test_io_load_depth_uses_native(tmp_path, lib_ok):
    from packnet_sfm_tpu.datasets.io import load_depth
    d16 = (np.random.RandomState(2).rand(20, 30) * 20 * 256 + 300
           ).astype(np.uint16)
    p = str(tmp_path / 'd.png')
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        Image.fromarray(d16, mode='I;16').save(p)
    depth = load_depth(p)
    np.testing.assert_allclose(depth, d16.astype(np.float32) / 256.0)
