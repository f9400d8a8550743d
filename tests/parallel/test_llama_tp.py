"""LLaMA tensor-parallel coverage (VERDICT r2 weak #3): the TP sharding rules
must know the LLaMA projection names (o_proj / gate_proj / up_proj /
down_proj), and a TP forward on the 8-device virtual mesh must match the
replicated forward. Without the names, a LLaMA tree under tensor_parallel=True
silently replicates its attention-out and entire MLP — exactly the silent-perf
cliff class this suite guards against.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from eilev_tpu.configs import LlamaConfig
from eilev_tpu.models.llama import LlamaForCausalLM
from eilev_tpu.parallel import make_mesh, param_shardings
from eilev_tpu.parallel.mesh import MODEL_AXIS


@pytest.fixture(scope="module")
def tiny_llama():
    cfg = LlamaConfig(
        vocab_size=96,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=64,
        max_position_embeddings=128,
    )
    model = LlamaForCausalLM(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, size=(2, 9)))
    def init_all(mdl):
        embeds = mdl.embed(jnp.zeros((1, 4), jnp.int32))
        return mdl(embeds)

    variables = model.init(jax.random.PRNGKey(0), method=init_all)
    return cfg, model, variables["params"], ids


def test_llama_tp_specs_shard_every_projection(tiny_llama):
    """Every LLaMA matmul family gets a non-replicated TP spec."""
    cfg, model, params, ids = tiny_llama
    mesh = make_mesh(data=4, model=2)
    shardings = param_shardings(params, mesh, tensor_parallel=True)

    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    specs = {}
    for path, sh in flat:
        keys = tuple(k.key if hasattr(k, "key") else str(k) for k in path)
        specs["/".join(keys)] = sh.spec

    def spec_of(fragment):
        hits = [s for name, s in specs.items() if fragment in name and name.endswith("kernel")]
        assert hits, f"no param matching {fragment}"
        return hits[0]

    assert spec_of("qkv_proj") == P(None, MODEL_AXIS)
    assert spec_of("gate_proj") == P(None, MODEL_AXIS)
    assert spec_of("up_proj") == P(None, MODEL_AXIS)
    assert spec_of("o_proj") == P(MODEL_AXIS, None)
    assert spec_of("down_proj") == P(MODEL_AXIS, None)


def test_llama_tp_forward_matches_replicated(tiny_llama):
    cfg, model, params, ids = tiny_llama
    mesh = make_mesh(data=4, model=2)
    shardings = param_shardings(params, mesh, tensor_parallel=True)
    sharded = jax.tree.map(jax.device_put, params, shardings)

    def fwd(p, i):
        embeds = model.apply({"params": p}, i, method=LlamaForCausalLM.embed)
        logits, _ = model.apply({"params": p}, embeds)
        return logits

    ref = np.asarray(jax.jit(fwd)(params, ids))
    with mesh:
        tp = np.asarray(jax.jit(fwd)(sharded, ids))
    np.testing.assert_allclose(tp, ref, rtol=2e-4, atol=2e-4)


def test_llama_tp_compiled_collectives_are_bounded(tiny_llama):
    """Packed-qkv column sharding splits across the q|k|v boundary; GSPMD must
    keep it correct via (small) activation collectives, not weight gathers.
    Guard: the compiled TP forward contains no all-gather whose operand is a
    2-D weight-shaped tensor (docs/DESIGN.md 'Packed-QKV under TP')."""
    cfg, model, params, ids = tiny_llama
    mesh = make_mesh(data=4, model=2)
    shardings = param_shardings(params, mesh, tensor_parallel=True)
    sharded = jax.tree.map(jax.device_put, params, shardings)

    def fwd(p, i):
        embeds = model.apply({"params": p}, i, method=LlamaForCausalLM.embed)
        logits, _ = model.apply({"params": p}, embeds)
        return logits

    with mesh:
        lowered = jax.jit(fwd).lower(sharded, ids)
        txt = lowered.compile().as_text()
    import re

    weight_gathers = []
    for m in re.finditer(r"all-gather[^\n]*", txt):
        line = m.group(0)
        # operand shapes appear like f32[16,64]{...}; a gather of a (in, out)
        # weight-sized operand would mean GSPMD replicated a sharded kernel
        for shape in re.findall(r"f32\[(\d+),(\d+)\]", line):
            a, b = int(shape[0]), int(shape[1])
            if a >= cfg.hidden_size and b >= cfg.hidden_size:
                weight_gathers.append(line)
    assert not weight_gathers, "\n".join(weight_gathers)
