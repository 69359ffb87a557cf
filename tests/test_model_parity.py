"""Per-pixel forward parity: Flax MultiScaleUPRetinex vs the torch reference,
with weights converted via models/convert.py. Exercises every module: FAM
(both attentions), Res/PreAct blocks, ASPP, UpBlocks, the Retinex decomposition
and the multi-scale enhancement head."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from retinex_tpu.models import MultiScaleUPRetinex
from retinex_tpu.models.convert import torch_state_dict_to_variables
from retinex_tpu.models.retinex_net import count_parameters


@pytest.fixture(autouse=True)
def _high_precision():
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old or "default")


def _torch_model(reference_path, use_preact, use_aspp, seed=0):
    import torch

    from models.model import MultiScaleUP_Retinex

    torch.manual_seed(seed)
    model = MultiScaleUP_Retinex(use_preact=use_preact, use_aspp=use_aspp)
    # Randomize BN running stats so the conversion of batch_stats is actually
    # exercised (fresh models have mean=0/var=1 which would hide swaps).
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    model.eval()
    return model


@pytest.mark.parametrize("use_preact,use_aspp", [(False, False), (True, True)])
def test_forward_parity(reference_path, use_preact, use_aspp):
    import torch

    tm = _torch_model(reference_path, use_preact, use_aspp)
    variables = torch_state_dict_to_variables(tm.state_dict(), use_preact, use_aspp)

    rng = np.random.default_rng(0)
    x = rng.random((2, 3, 64, 64), dtype=np.float32) * 0.5 + 0.05
    with torch.no_grad():
        t_enh, t_refl, t_illu = tm(torch.from_numpy(x))

    fm = MultiScaleUPRetinex(use_preact=use_preact, use_aspp=use_aspp)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    j_enh, j_refl, j_illu = fm.apply(variables, xj, train=False)

    for name, tv, jv in [
        ("illumination", t_illu, j_illu),
        ("reflectance", t_refl, j_refl),
        ("enhanced", t_enh, j_enh),
    ]:
        want = tv.numpy().transpose(0, 2, 3, 1)
        got = np.asarray(jv)
        diff = np.abs(want - got)
        # Reflectance divides by illu (+1e-6) so small illu errors amplify.
        tol = 5e-3 if name == "reflectance" else 1e-3
        assert diff.max() < tol, f"{name}: max diff {diff.max()}"


def test_param_counts_match_reference(reference_path):
    """BASELINE.md: 4,275,475 params (base), 6,506,323 (preact+ASPP)."""
    fm = MultiScaleUPRetinex(use_preact=False, use_aspp=False)
    v = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    assert count_parameters(v["params"]) == 4_275_475

    fm2 = MultiScaleUPRetinex(use_preact=True, use_aspp=True)
    v2 = fm2.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    assert count_parameters(v2["params"]) == 6_506_323


def test_output_shapes_and_ranges():
    fm = MultiScaleUPRetinex(use_preact=False, use_aspp=False)
    x = jnp.asarray(np.random.default_rng(1).random((1, 64, 96, 3), dtype=np.float32))
    v = fm.init(jax.random.PRNGKey(0), x, train=False)
    enh, refl, illu = fm.apply(v, x, train=False)
    assert enh.shape == (1, 64, 96, 3)
    assert refl.shape == (1, 64, 96, 3)
    assert illu.shape == (1, 64, 96, 1)
    assert float(illu.min()) >= 0.0 and float(illu.max()) <= 1.0  # sigmoid head


def test_train_mode_batch_stats_update():
    fm = MultiScaleUPRetinex(use_preact=False, use_aspp=False)
    x = jnp.asarray(np.random.default_rng(2).random((2, 32, 32, 3), dtype=np.float32))
    v = fm.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x, train=False)
    (_, _, _), updates = fm.apply(
        v, x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)}
    )
    # At least one running stat must have moved.
    before = jax.tree_util.tree_leaves(v["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))
