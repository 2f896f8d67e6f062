"""FITS reader/writer + preprocessing chain on the bundled reference images."""

import numpy as np
import pytest

from caesar_mrcnn_tpu.utils import fits as F
from caesar_mrcnn_tpu.utils.zscale import contrast_bias_stretch, zscale_stretch


def test_read_header_galaxy(ref_data_dir):
    hdr = F.read_header(f"{ref_data_dir}/galaxy0002.fits")
    assert hdr["NAXIS"] == 2
    assert hdr["NAXIS1"] == 132
    assert hdr["NAXIS2"] == 132
    assert hdr["BITPIX"] == -32
    assert hdr["TELESCOP"].strip() == "EVLA"
    assert abs(hdr["BMAJ"] - 1.7778e-3) < 1e-6


def test_get_fits_size(ref_data_dir):
    assert F.get_fits_size(f"{ref_data_dir}/galaxy0002.fits") == (132, 132)
    assert F.get_fits_size(f"{ref_data_dir}/sidelobe0001.fits") == (132, 132)


def test_read_data_full_and_window(ref_data_dir):
    path = f"{ref_data_dir}/galaxy0002.fits"
    full, hdr = F.read_fits_data(path)
    assert full.shape == (132, 132)
    assert full.dtype == np.float32
    win, _ = F.read_fits_data(path, xmin=10, xmax=50, ymin=20, ymax=60)
    assert win.shape == (40, 40)
    np.testing.assert_array_equal(win, full[20:60, 10:50])


def test_read_fits_rgb_uint8(ref_data_dir):
    img, hdr = F.read_fits(f"{ref_data_dir}/galaxy0002.fits")
    assert img.shape == (132, 132, 3)
    assert img.dtype == np.uint8
    # zscale contrast identical per channel -> channels equal
    np.testing.assert_array_equal(img[..., 0], img[..., 1])
    assert img.max() == 255  # normalized to full range
    assert img.min() >= 0


def test_read_fits_gray_float(ref_data_dir):
    img, hdr = F.read_fits(
        f"{ref_data_dir}/galaxy0002.fits",
        convert_to_rgb=False,
        to_uint8=False,
        stretch=True,
        normalize=True,
    )
    assert img.shape == (132, 132)
    assert img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0


def test_write_read_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    data = rng.randn(64, 48).astype(np.float32)
    path = str(tmp_path / "test.fits")
    F.write_fits(data, path, header={"BMAJ": 1.5e-3, "TELESCOP": "TEST"})
    back, hdr = F.read_fits_data(path)
    np.testing.assert_array_equal(back, data)
    assert abs(hdr["BMAJ"] - 1.5e-3) < 1e-9
    assert str(hdr["TELESCOP"]).strip() == "TEST"
    # windowed read on written file
    win, _ = F.read_fits_data(path, xmin=5, xmax=20, ymin=3, ymax=30)
    np.testing.assert_array_equal(win, data[3:30, 5:20])


def test_zscale_basic():
    rng = np.random.RandomState(1)
    data = rng.normal(10.0, 2.0, (100, 100))
    out = zscale_stretch(data, contrast=0.25)
    assert out.min() >= 0 and out.max() <= 1
    # zscale should clip outliers: a huge spike maps to 1.0 but doesn't
    # compress the bulk of the distribution
    data_spike = data.copy()
    data_spike[0, 0] = 1e6
    out2 = zscale_stretch(data_spike, contrast=0.25)
    assert out2[0, 0] == 1.0
    # The sigma-clipped fit keeps the bulk of the distribution spread out
    # instead of compressing it against the spike.
    assert (out2 == 1.0).mean() < 0.05
    assert out2.std() > 0.05


def test_zscale_handles_nan():
    data = np.full((10, 10), np.nan)
    data[0, 0] = 1.0
    vmin, vmax = __import__(
        "caesar_mrcnn_tpu.utils.zscale", fromlist=["zscale_limits"]
    ).zscale_limits(data)
    assert np.isfinite(vmin) and np.isfinite(vmax)


def test_contrast_bias():
    x = np.linspace(0, 1, 11)
    out = contrast_bias_stretch(x, contrast=1.0, bias=0.5)
    np.testing.assert_allclose(out, x, atol=1e-6)
    out2 = contrast_bias_stretch(x, contrast=2.0, bias=0.5)
    assert out2[0] == 0.0 and out2[-1] == 1.0


def test_linear_wcs_roundtrip():
    hdr = {
        "CRPIX1": 66.0,
        "CRPIX2": 66.0,
        "CRVAL1": 150.0,
        "CRVAL2": 2.0,
        "CDELT1": -5e-4,
        "CDELT2": 5e-4,
    }
    wcs = F.LinearWCS(hdr)
    ra, dec = wcs.pixel_to_world(10.0, 20.0)
    x, y = wcs.world_to_pixel(ra, dec)
    assert abs(x - 10.0) < 1e-6 and abs(y - 20.0) < 1e-6


def test_tiles():
    from caesar_mrcnn_tpu.utils.tiles import generate_tiles, tiles_overlap

    tiles = generate_tiles(0, 1000, 0, 1000, 512, 512, 1.0, 1.0)
    assert len(tiles) == 4
    assert tiles[0] == (0, 512, 0, 512)
    assert tiles[-1] == (488, 1000, 488, 1000)
    # overlapping grid
    tiles2 = generate_tiles(0, 1000, 0, 1000, 512, 512, 0.5, 0.5)
    assert len(tiles2) > 4
    assert tiles_overlap(tiles2[0], tiles2[1])
    assert not tiles_overlap((0, 10, 0, 10), (20, 30, 20, 30))


def test_union_find_graph():
    from caesar_mrcnn_tpu.utils.graph import Graph

    g = Graph(6)
    g.addEdge(0, 1)
    g.addEdge(1, 2)
    g.addEdge(3, 4)
    comps = sorted(sorted(c) for c in g.connectedComponents())
    assert comps == [[0, 1, 2], [3, 4], [5]]


def test_preprocess_tile_u8_matches_read_fits_chain(tmp_path, ref_data_dir):
    """The fused single-channel fast path must reproduce the full
    read_fits preprocessing chain (stretch -> normalize -> gray2rgb u8)
    bit-for-bit up to 1 quantum on rounding-boundary pixels."""
    rng = np.random.RandomState(5)
    data = rng.normal(0.0, 0.05, (96, 96)).astype(np.float32)
    data[10:20, 10:20] += 5.0
    data[40, 40] = np.nan
    data[50, 60] = np.inf
    path = str(tmp_path / "t.fits")
    F.write_fits(data, path)

    slow = F.read_fits(path)[0][..., 0]
    fast = F.read_tile_u8(path)
    assert fast.dtype == np.uint8 and fast.shape == slow.shape
    diff = np.abs(fast.astype(np.int32) - slow.astype(np.int32))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.99

    # windowed reads agree too, on a real reference image
    gpath = f"{ref_data_dir}/galaxy0002.fits"
    slow_w = F.read_fits(gpath, xmin=4, xmax=100, ymin=8, ymax=104)[0][..., 0]
    fast_w = F.read_tile_u8(gpath, xmin=4, xmax=100, ymin=8, ymax=104)
    diff_w = np.abs(fast_w.astype(np.int32) - slow_w.astype(np.int32))
    assert diff_w.max() <= 1
    assert (diff_w == 0).mean() > 0.99


def test_read_tile_raw_limits_match_host_stretch(tmp_path):
    """read_tile_raw's (raw, limits) must reproduce the u8 fast path when
    pushed through the same fused stretch — the host side of the
    on-device preprocessing contract."""
    from caesar_mrcnn_tpu.native import stretch_to_u8

    rng = np.random.RandomState(6)
    data = rng.normal(0.0, 0.1, (64, 64)).astype(np.float32)
    data[5:15, 5:15] += 3.0
    data[0, 0] = np.nan
    path = str(tmp_path / "r.fits")
    F.write_fits(data, path)

    raw, (vmin, vmax) = F.read_tile_raw(path)
    assert np.isfinite(raw).all()  # NaNs filled before the fit
    u8 = F.read_tile_u8(path)
    np.testing.assert_array_equal(stretch_to_u8(raw, vmin, vmax), u8)
