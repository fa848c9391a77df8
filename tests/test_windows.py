import numpy as np
import pytest

from dsptpu.ops import windows as W
from helpers import read_reference_data


def test_makewindow_sampling():
    ident = lambda x: np.asarray(x, dtype=np.float64)
    np.testing.assert_allclose(W.makewindow(ident, 6, 0, False),
                               [-0.5, -0.3, -0.1, 0.1, 0.3, 0.5], atol=1e-15)
    win = W.makewindow(ident, 6, 0, True)
    ok1 = np.allclose(win, [0.0, 1 / 6, 1 / 3, 1 / 2, -1 / 3, -1 / 6])
    ok2 = np.allclose(win, [0.0, 1 / 6, 1 / 3, -1 / 2, -1 / 3, -1 / 6])
    assert ok1 or ok2
    np.testing.assert_allclose(W.makewindow(ident, 6, 2, False),
                               [-0.5, -0.3, -0.1, 0.1, 0.3, 0.5, 0.0, 0.0], atol=1e-15)
    np.testing.assert_allclose(W.makewindow(ident, 6, 2, True),
                               [0.0, 1 / 6, 1 / 3, 1 / 2, 0.0, -1 / 2, -1 / 3, -1 / 6], atol=1e-15)
    np.testing.assert_allclose(W.makewindow(ident, 5, 0, False),
                               [-0.5, -0.25, 0.0, 0.25, 0.5], atol=1e-15)
    np.testing.assert_allclose(W.makewindow(ident, 5, 0, True),
                               [0.0, 0.2, 0.4, -0.4, -0.2], atol=1e-15)
    np.testing.assert_allclose(W.makewindow(ident, 5, 2, True),
                               [0.0, 0.2, 0.4, 0.0, 0.0, -0.4, -0.2], atol=1e-15)
    np.testing.assert_allclose(W.makewindow(lambda x: 42.0, 1, 2, True),
                               [42.0, 0.0, 0.0], atol=1e-15)


FIXTURES = [
    (lambda: W.hanning(128), "hanning128.txt"),
    (lambda: W.hamming(128), "hamming128.txt"),
    (lambda: W.triang(128), "triang128.txt"),
    (lambda: W.bartlett(128), "bartlett128.txt"),
    (lambda: W.bartlett_hann(128), "bartlett_hann128.txt"),
    (lambda: W.blackman(128), "blackman128.txt"),
    (lambda: W.blackmanharris(128, 3), "blackmanharris_3term_128.txt"),
    (lambda: W.blackmanharris(128), "blackmanharris_4term_128.txt"),
    (lambda: W.nuttall(128, 3), "nuttall_3term_128.txt"),
    (lambda: W.nuttall(128), "nuttall_4term_128.txt"),
    (lambda: W.kaiser(128, 0.4 / np.pi), "kaiser128,0.4.txt"),
    (lambda: W.flattop(128), "flattop.txt"),
    (lambda: W.gaussian(128, 0.2), "gaussian128,0.2.txt"),
    (lambda: W.tukey(128, 0.4), "tukey128,0.4.txt"),
    (lambda: W.cosine(128), "cosine128.txt"),
    (lambda: W.lanczos(128), "lanczos128.txt"),
]


@pytest.mark.parametrize("make,fname", FIXTURES, ids=[f[1] for f in FIXTURES])
def test_window_fixture(make, fname):
    ref = read_reference_data(fname)
    np.testing.assert_allclose(make(), ref, rtol=1e-12, atol=1e-14)


def test_window_edge_cases():
    assert np.array_equal(W.rect(128), np.ones(128))
    np.testing.assert_allclose(W.triang(5), W.bartlett(7)[1:6], atol=1e-15)
    assert np.array_equal(W.tukey(128, 0), W.rect(128))
    # cosine is sqrt of hanning
    np.testing.assert_allclose(W.cosine(128) ** 2, W.hanning(128), atol=1e-14)
    with pytest.raises(ValueError):
        W.blackmanharris(128, 5)
    with pytest.raises(ValueError):
        W.gaussian(128, -1.0)
    with pytest.raises(ValueError):
        W.tukey(128, 1.5)
    with pytest.raises(ValueError):
        W.makewindow(lambda x: x, -1, 0, False)


def test_dpss_fixture():
    d1 = W.dpss(128, 4)
    d2 = read_reference_data("dpss128,4.txt")
    assert d1.shape == d2.shape == (128, 7)
    np.testing.assert_allclose(d1, d2, rtol=1e-7, atol=1e-10)

    lam = np.array([
        0.9999999997159923, 0.9999999731146645, 0.9999988168667646,
        0.9999680890685374, 0.9994167543397652, 0.9925560207018469,
        0.9368556668429153])
    np.testing.assert_allclose(W.dpsseig(d1, 4), lam, rtol=1e-9)


def test_dpss_validation():
    with pytest.raises(ValueError):
        W.dpss(127, 4, zerophase=True)
    with pytest.raises(ValueError):
        W.dpss(128, 4, 0)
    with pytest.raises(ValueError):
        W.dpss(128, 65)


def test_2d_windows():
    w2 = W.hanning((16, 32))
    assert w2.shape == (16, 32)
    np.testing.assert_allclose(w2, np.outer(W.hanning(16), W.hanning(32)))
    g2 = W.gaussian((16, 16), (0.2, 0.3))
    np.testing.assert_allclose(
        g2, np.outer(W.gaussian(16, 0.2), W.gaussian(16, 0.3)))
    k2 = W.kaiser((8, 8), 2.0, padding=(2, 0))
    assert k2.shape == (10, 8)


def test_besseli0_against_series_identity():
    from dsptpu.utils.special import besseli0
    # cross-check small/large branch continuity and known values
    np.testing.assert_allclose(besseli0(0.0), 1.0)
    np.testing.assert_allclose(besseli0(1.0), 1.2660658777520084, rtol=1e-14)
    # branch boundary consistency via scipy when available
    scipy_special = pytest.importorskip("scipy.special")
    x = np.linspace(0.01, 700.0, 2001)
    np.testing.assert_allclose(besseli0(x), scipy_special.i0(x), rtol=5e-14)
    # our asymptotic branch stays finite past scipy's overflow point
    assert np.isfinite(besseli0(712.0))
