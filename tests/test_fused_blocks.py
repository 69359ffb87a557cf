"""Fused whole-block Pallas kernels (ops/fused_blocks.py) vs XLA formulations.

Interpreter mode on CPU; real lowering is exercised by scripts/perf_lab.py
(`netstages`) and the TPU benchmark. Both kernels must be exact up to f32
reassociation (they implement the same math as the packed XLA path that
tests/test_packed_inference.py already validates against the Flax model).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from retinex_tpu.ops.fused_blocks import dec1_chain, fam_dual_conv3, fam_dual_supported


def _conv(x, k, b=None, pad=1):
    out = lax.conv_general_dilated(
        x, k, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out if b is None else out + b


def test_fam_dual_supported():
    assert fam_dual_supported((2, 544, 960, 128))  # the packed 1080p shape
    assert fam_dual_supported((1, 16, 128, 128))
    assert not fam_dual_supported((1, 16, 128, 64))  # wrong channel count
    assert not fam_dual_supported((1, 15, 100, 128))  # no valid tiles


def test_fam_dual_conv3_matches_xla():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 16, 128, 128)) * 0.3, jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, 128, 256)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((256,)), jnp.float32)
    k2a = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
    b2a = jnp.asarray(rng.standard_normal((128,)), jnp.float32)
    k2b = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
    b2b = jnp.asarray(rng.standard_normal((128,)), jnp.float32)

    y = jax.nn.relu(_conv(x, k1, b1))
    want = jnp.concatenate(
        [_conv(y[..., :128], k2a, b2a), _conv(y[..., 128:], k2b, b2b)], axis=-1
    )
    got = fam_dual_conv3(x, k1, b1, k2a, b2a, k2b, b2b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_dec1_chain_matches_xla():
    rng = np.random.default_rng(1)
    d2 = jnp.asarray(rng.standard_normal((1, 16, 128, 64)) * 0.3, jnp.float32)
    x1p = jnp.asarray(np.abs(rng.standard_normal((1, 16, 128, 128))) * 0.3, jnp.float32)
    ku = jnp.asarray(rng.standard_normal((1, 1, 64, 128)) * 0.1, jnp.float32)
    bu = jnp.asarray(rng.standard_normal((128,)) * 0.1, jnp.float32)
    ks = [jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32) for _ in range(3)]
    bs = [jnp.asarray(rng.standard_normal((128,)) * 0.1, jnp.float32) for _ in range(3)]

    y = _conv(d2, ku, bu, pad=0)
    y = jax.nn.relu(_conv(y, ks[0], bs[0]))
    y = jax.nn.relu(_conv(y, ks[1], bs[1])) + x1p
    want = jax.nn.relu(_conv(y, ks[2], bs[2]))
    got = dec1_chain(
        d2, x1p, ku, bu, ks[0], bs[0], ks[1], bs[1], ks[2], bs[2], interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fam_tail_kernels_match_xla():
    from retinex_tpu.ops.fused_blocks import (
        fam_tail_apply,
        fam_tail_stats,
        fam_tail_supported,
    )

    rng = np.random.default_rng(2)
    b, h, w, c = 2, 8, 64, 32
    out = jnp.asarray(np.abs(rng.standard_normal((b, h, w, 4 * c))) * 0.4, jnp.float32)
    ca = jnp.asarray(jax.nn.sigmoid(jnp.asarray(rng.standard_normal((b, c)), jnp.float32)))
    ca_vec = jnp.tile(ca, 4)
    assert fam_tail_supported(out.shape)

    # reference tail math (models/packed_inference._fam_packed fallback branch)
    scaled = out * ca_vec[:, None, None, :]
    blocks = scaled.reshape(b, h, w, 4, c)
    want_sa_in = jnp.stack(
        [blocks.mean(axis=-1), blocks.max(axis=-1)], axis=-1
    ).reshape(b, h, w, 8)
    got_sa_in = fam_tail_stats(out, ca_vec, interpret=True)
    np.testing.assert_allclose(np.asarray(got_sa_in), np.asarray(want_sa_in), atol=1e-5)

    sa = jnp.asarray(jax.nn.sigmoid(jnp.asarray(rng.standard_normal((b, h, w, 4)), jnp.float32)))
    want = (blocks * sa[..., None]).reshape(b, h, w, 4 * c)
    got = fam_tail_apply(out, ca_vec, sa, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fam_conv_fused_matches_xla():
    """The whole-FAM-conv kernel vs the composed branch math (weights folded
    the same way models/packed_inference._pack_fam does)."""
    from retinex_tpu.ops.fused_blocks import fam_conv_fused, fam_conv_supported
    from retinex_tpu.ops.s2d import maxpool3x3_s1_s2d

    rng = np.random.default_rng(5)
    b, h, w, cin = 1, 16, 128, 128
    x = jnp.asarray(np.abs(rng.standard_normal((b, h, w, cin))) * 0.3, jnp.float32)
    assert fam_conv_supported(x.shape)

    w1 = jnp.asarray(rng.standard_normal((1, 1, cin, cin)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((1, 1, cin, cin)) * 0.05, jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, cin, 256)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((256,)) * 0.1, jnp.float32)
    k32 = jnp.asarray(rng.standard_normal((3, 3, cin, cin)) * 0.05, jnp.float32)
    k42 = jnp.asarray(rng.standard_normal((3, 3, cin, cin)) * 0.05, jnp.float32)
    wf = [jnp.asarray(rng.standard_normal((cin, cin)) * 0.05, jnp.float32) for _ in range(4)]
    bf = jnp.asarray(rng.standard_normal((cin,)) * 0.1, jnp.float32)

    # reference composition
    y = jax.nn.relu(_conv(x, k1, b1))
    br1 = _conv(x, w1, pad=0)
    br2 = _conv(maxpool3x3_s1_s2d(x), w2, pad=0)
    br3 = _conv(y[..., :cin], k32)
    br4 = _conv(y[..., cin:], k42)
    want = jax.nn.relu(
        jnp.einsum("bhwc,cp->bhwp", br1, wf[0])
        + jnp.einsum("bhwc,cp->bhwp", br2, wf[1])
        + jnp.einsum("bhwc,cp->bhwp", br3, wf[2])
        + jnp.einsum("bhwc,cp->bhwp", br4, wf[3])
        + bf
    )

    ka = w1[0, 0] @ wf[0]
    kb = w2[0, 0] @ wf[1]
    k32f = jnp.einsum("uvio,op->uvip", k32, wf[2])
    k42f = jnp.einsum("uvio,op->uvip", k42, wf[3])
    got = fam_conv_fused(x, ka, kb, k1, b1, k32f, k42f, bf, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fam_tail_apply_g1_matches_xla():
    from retinex_tpu.ops.fused_blocks import fam_tail_apply_g1

    rng = np.random.default_rng(6)
    b, h, w, c = 1, 8, 64, 32
    out = jnp.asarray(np.abs(rng.standard_normal((b, h, w, 4 * c))) * 0.4, jnp.float32)
    ca_vec = jnp.tile(jnp.asarray(jax.nn.sigmoid(
        jnp.asarray(rng.standard_normal((b, c)), jnp.float32))), 4)
    sa = jnp.asarray(jax.nn.sigmoid(
        jnp.asarray(rng.standard_normal((b, h, w, 4)), jnp.float32)))
    wg = jnp.asarray(rng.standard_normal((4 * c, 4 * c)) * 0.05, jnp.float32)

    scaled = out * ca_vec[:, None, None, :]
    blocks = scaled.reshape(b, h, w, 4, c)
    applied = (blocks * sa[..., None]).reshape(b, h, w, 4 * c)
    want = jnp.einsum("bhwc,cp->bhwp", applied, wg)
    got = fam_tail_apply_g1(out, ca_vec, sa, wg, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
