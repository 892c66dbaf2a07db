"""Ring-parallel single alignment vs the single-device path (SURVEY.md
§3.2 ring row; VERDICT r1 item 7): lanes sharded over the simulated mesh,
boundary carries over ppermute, bit-equal results."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from praline_tpu import builtin_score_matrix
from praline_tpu.dist import make_pair_mesh
from praline_tpu.dist.ring import ring_wavefront_dp
from praline_tpu.kernels.scan import wavefront_dp
from praline_tpu.kernels.scores import skewed_pair_scores

B62 = builtin_score_matrix("blosum62")


def require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} simulated devices")


def _problem(seed=0, B=2, Lx=45, Ly=33, A=23):
    rng = np.random.default_rng(seed)
    cx = (rng.integers(0, 3, size=(B, Lx, A)) + (np.arange(A) == 0)).astype(np.float32)
    cy = (rng.integers(0, 3, size=(B, Ly, A)) + (np.arange(A) == 0)).astype(np.float32)
    ivx = (1.0 / np.maximum(cx.sum(-1), 1)).astype(np.float32)
    ivy = (1.0 / np.maximum(cy.sum(-1), 1)).astype(np.float32)
    lx = rng.integers(max(1, Lx // 2), Lx + 1, size=B).astype(np.int32)
    ly = rng.integers(max(1, Ly // 2), Ly + 1, size=B).astype(np.int32)
    return cx, ivx, cy, ivy, lx, ly


@pytest.mark.parametrize("mode", ["global", "semiglobal", "local"])
@pytest.mark.parametrize("n", [2, 8])
@pytest.mark.parametrize("interval", [1, None])
def test_ring_matches_single_device(mode, n, interval):
    require_devices(n)
    cx, ivx, cy, ivy, lx, ly = _problem()
    s = np.asarray(B62.as_f32())
    hs = skewed_pair_scores(*map(jnp.asarray, (cx, ivx, cy, ivy, s)))
    want = wavefront_dp(hs, jnp.asarray(lx), jnp.asarray(ly),
                        gap_series=(11, 1), mode=mode, traceback=True)
    got = ring_wavefront_dp(make_pair_mesh(n), cx, ivx, cy, ivy, s, lx, ly,
                            gap_series=(11, 1), mode=mode, traceback=True,
                            interval=interval)
    for key in ("score", "length", "ti", "tj", "tcode"):
        np.testing.assert_array_equal(
            np.asarray(want[key]), np.asarray(got[key]), err_msg=key
        )
    tbw = np.asarray(want["tb"])
    tbg = np.asarray(got["tb"])[:, :, : tbw.shape[2]]
    np.testing.assert_array_equal(tbw, tbg)


@pytest.mark.parametrize("interval", [3, 7, 200])
def test_ring_superstep_odd_intervals(interval):
    """Chunk sizes that do not divide the diagonal count, and one larger
    than the whole diagonal range, stay bit-exact (pipeline fill/drain
    supersteps are select-discarded)."""
    require_devices(4)
    cx, ivx, cy, ivy, lx, ly = _problem(seed=5, B=2, Lx=37, Ly=26)
    s = np.asarray(B62.as_f32())
    hs = skewed_pair_scores(*map(jnp.asarray, (cx, ivx, cy, ivy, s)))
    want = wavefront_dp(hs, jnp.asarray(lx), jnp.asarray(ly),
                        gap_series=(11, 1), mode="semiglobal", traceback=True)
    got = ring_wavefront_dp(make_pair_mesh(4), cx, ivx, cy, ivy, s, lx, ly,
                            gap_series=(11, 1), mode="semiglobal",
                            traceback=True, interval=interval)
    for key in ("score", "length", "ti", "tj", "tcode"):
        np.testing.assert_array_equal(
            np.asarray(want[key]), np.asarray(got[key]), err_msg=key
        )
    tbw = np.asarray(want["tb"])
    tbg = np.asarray(got["tb"])[:, :, : tbw.shape[2]]
    np.testing.assert_array_equal(tbw, tbg)


def test_ring_gap_series_and_ragged():
    require_devices(4)
    cx, ivx, cy, ivy, lx, ly = _problem(seed=3, B=3, Lx=29, Ly=41)
    s = np.asarray(B62.as_f32())
    hs = skewed_pair_scores(*map(jnp.asarray, (cx, ivx, cy, ivy, s)))
    want = wavefront_dp(hs, jnp.asarray(lx), jnp.asarray(ly),
                        gap_series=(13, 7, 1), mode="global")
    got = ring_wavefront_dp(make_pair_mesh(4), cx, ivx, cy, ivy, s, lx, ly,
                            gap_series=(13, 7, 1), mode="global")
    for key in ("score", "length", "ti", "tj", "tcode"):
        np.testing.assert_array_equal(
            np.asarray(want[key]), np.asarray(got[key]), err_msg=key
        )
