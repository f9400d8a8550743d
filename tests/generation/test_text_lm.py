"""TextLM: local OPT-family checkpoint -> text generation (the Llama-2 role)."""

import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tests")


@pytest.fixture(scope="module")
def opt_checkpoint(tmp_path_factory):
    from transformers import OPTConfig as HFOPTConfig, OPTForCausalLM

    from tests.util_tokenizer import build_tiny_tokenizer

    d = str(tmp_path_factory.mktemp("opt_ckpt"))
    cfg = HFOPTConfig(
        vocab_size=384, hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
        ffn_dim=32, max_position_embeddings=128, word_embed_proj_dim=16,
        dropout=0.0, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = OPTForCausalLM(cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    build_tiny_tokenizer(d, vocab_size=384)
    return d, model


def test_text_lm_greedy_matches_hf(opt_checkpoint):
    path, hf_model = opt_checkpoint
    import jax.numpy as jnp

    from eilev_tpu.generation import GenerationConfig
    from eilev_tpu.generation.text_lm import TextLM

    lm = TextLM(path, dtype=jnp.float32)
    prompts = ["The camera wearer opens a drawer", "Question: What is the camera wearer doing?"]
    texts = lm.generate(
        prompts,
        GenerationConfig(max_new_tokens=6, pad_token_id=lm.tokenizer.pad_token_id,
                         eos_token_id=(0,)),
    )
    assert len(texts) == 2

    # token-level parity against HF generate on the same left-padded batch
    from eilev_tpu.data.collate import _pad_1d

    enc = [lm.tokenizer(t)["input_ids"] for t in prompts]
    longest = max(len(e) for e in enc)
    ids = np.stack([_pad_1d(np.asarray(e), longest, lm.tokenizer.pad_token_id, "left") for e in enc])
    mask = np.stack([_pad_1d(np.ones(len(e), np.int64), longest, 0, "left") for e in enc])
    with torch.no_grad():
        ref = hf_model.generate(
            inputs_embeds=hf_model.get_input_embeddings()(torch.tensor(ids)),
            attention_mask=torch.tensor(mask),
            max_new_tokens=6, do_sample=False, eos_token_id=0, pad_token_id=1,
        ).numpy()
    embeds = lm.module.apply(lm.variables, jnp.asarray(ids), method=type(lm.module).embed_and_scatter)
    from eilev_tpu.generation.decoding import _greedy_sample_decoder_only
    import jax

    ours = np.asarray(
        _greedy_sample_decoder_only(
            lm.module, lm.variables, embeds, jnp.asarray(mask),
            GenerationConfig(max_new_tokens=6, pad_token_id=1, eos_token_id=(0,)),
            jax.random.PRNGKey(0),
        )
    )
    n = min(ref.shape[1], ours.shape[1])
    np.testing.assert_array_equal(ours[:, :n], ref[:, :n])


@pytest.fixture(scope="module")
def llama_checkpoint(tmp_path_factory):
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    from tests.util_tokenizer import build_tiny_tokenizer

    d = str(tmp_path_factory.mktemp("llama_ckpt"))
    cfg = HFLlamaConfig(
        vocab_size=384, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=64, max_position_embeddings=128,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    build_tiny_tokenizer(d, vocab_size=384)
    return d, model


def test_text_lm_llama_greedy_matches_hf(llama_checkpoint):
    """The Llama-2-chat recipe the reference actually runs
    (generate_std_sent.py:24-45), token-identical through TextLM."""
    path, hf_model = llama_checkpoint
    import jax
    import jax.numpy as jnp

    from eilev_tpu.data.collate import _pad_1d
    from eilev_tpu.generation import GenerationConfig
    from eilev_tpu.generation.decoding import _greedy_sample_decoder_only
    from eilev_tpu.generation.text_lm import TextLM

    lm = TextLM(path, dtype=jnp.float32)
    from eilev_tpu.configs import LlamaConfig

    assert isinstance(lm.config.text_config, LlamaConfig)
    prompts = ["[INST] Generate a sentence [/INST]", "cut onion"]
    texts = lm.generate(
        prompts,
        GenerationConfig(max_new_tokens=6, pad_token_id=lm.tokenizer.pad_token_id,
                         eos_token_id=(0,)),
    )
    assert len(texts) == 2

    enc = [lm.tokenizer(t)["input_ids"] for t in prompts]
    longest = max(len(e) for e in enc)
    ids = np.stack([_pad_1d(np.asarray(e), longest, lm.tokenizer.pad_token_id, "left") for e in enc])
    mask = np.stack([_pad_1d(np.ones(len(e), np.int64), longest, 0, "left") for e in enc])
    with torch.no_grad():
        ref = hf_model.generate(
            inputs_embeds=hf_model.get_input_embeddings()(torch.tensor(ids)),
            attention_mask=torch.tensor(mask),
            max_new_tokens=6, do_sample=False, eos_token_id=None, pad_token_id=0,
        ).numpy()
    embeds = lm.module.apply(lm.variables, jnp.asarray(ids), method=type(lm.module).embed_and_scatter)
    ours = np.asarray(
        _greedy_sample_decoder_only(
            lm.module, lm.variables, embeds, jnp.asarray(mask),
            GenerationConfig(max_new_tokens=6, pad_token_id=0, eos_token_id=()),
            jax.random.PRNGKey(0),
        )
    )
    n = min(ref.shape[1], ours.shape[1])
    np.testing.assert_array_equal(ours[:, :n], ref[:, :n])


def test_text_lm_llama_beam_matches_hf(llama_checkpoint):
    path, hf_model = llama_checkpoint
    import jax.numpy as jnp

    from eilev_tpu.data.collate import _pad_1d
    from eilev_tpu.generation import GenerationConfig
    from eilev_tpu.generation.decoding import _beam_search_decoder_only
    from eilev_tpu.generation.text_lm import TextLM

    lm = TextLM(path, dtype=jnp.float32)
    prompts = ["The camera wearer cuts", "a b"]
    enc = [lm.tokenizer(t)["input_ids"] for t in prompts]
    longest = max(len(e) for e in enc)
    ids = np.stack([_pad_1d(np.asarray(e), longest, lm.tokenizer.pad_token_id, "left") for e in enc])
    mask = np.stack([_pad_1d(np.ones(len(e), np.int64), longest, 0, "left") for e in enc])
    with torch.no_grad():
        ref = hf_model.generate(
            inputs_embeds=hf_model.get_input_embeddings()(torch.tensor(ids)),
            attention_mask=torch.tensor(mask),
            max_new_tokens=5, num_beams=3, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        ).numpy()
    embeds = lm.module.apply(lm.variables, jnp.asarray(ids), method=type(lm.module).embed_and_scatter)
    ours = np.asarray(
        _beam_search_decoder_only(
            lm.module, lm.variables, embeds, jnp.asarray(mask),
            GenerationConfig(max_new_tokens=5, num_beams=3, pad_token_id=0, eos_token_id=()),
        )
    )
    n = min(ref.shape[1], ours.shape[1])
    np.testing.assert_array_equal(ours[:, :n], ref[:, :n])


def test_text_lm_rejects_non_opt(tmp_path):
    import json

    d = tmp_path / "t5dir"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({"model_type": "t5"}))
    from eilev_tpu.generation.text_lm import TextLM

    with pytest.raises(ValueError, match="OPT-family"):
        TextLM(str(d))


def test_text_lm_int8_llama_runs(llama_checkpoint):
    """--int8_lm serving path: quantized LLaMA loads and generates sane text."""
    path, _ = llama_checkpoint
    import jax.numpy as jnp

    from eilev_tpu.generation import GenerationConfig
    from eilev_tpu.generation.text_lm import TextLM

    lm = TextLM(path, dtype=jnp.float32, int8=True)
    assert lm.config.text_config.quantize_matmuls
    # the transformed tree carries int8 kernels
    leaf = lm.variables["params"]["language_model"]["layers_0"]["self_attn"]["qkv_proj"]
    assert set(leaf) == {"w8", "scale"} and leaf["w8"].dtype == jnp.int8
    texts = lm.generate(
        ["[INST] Generate a sentence [/INST]"],
        GenerationConfig(max_new_tokens=4, pad_token_id=lm.tokenizer.pad_token_id,
                         eos_token_id=(0,)),
    )
    assert len(texts) == 1 and isinstance(texts[0], str)


@pytest.mark.slow
def test_text_lm_prompt_lookup_matches_plain(opt_checkpoint, llama_checkpoint):
    """draft='prompt_lookup' on TextLM is token-identical to plain greedy for
    both decoder families (the decode fn is family-generic: OPT and LLaMA
    share the cache contract)."""
    import jax.numpy as jnp

    from eilev_tpu.generation import GenerationConfig
    from eilev_tpu.generation.text_lm import TextLM

    prompts = [
        "The camera wearer opens a drawer and takes a knife from the drawer",
        "Question: What is the camera wearer doing? Answer: The camera wearer",
    ]
    for path, _ in (opt_checkpoint, llama_checkpoint):
        lm = TextLM(path, dtype=jnp.float32)
        cfg = GenerationConfig(
            max_new_tokens=10, pad_token_id=lm.tokenizer.pad_token_id,
            eos_token_id=(0,),
        )
        plain = lm.generate(prompts, cfg)
        pld = lm.generate(prompts, cfg, draft="prompt_lookup", draft_tokens=6)
        assert pld == plain
        with pytest.raises(ValueError, match="prompt_lookup"):
            lm.generate(prompts, cfg, draft="ngram_tree")


def test_text_lm_prompt_lookup_sampling_routes(opt_checkpoint):
    """draft='prompt_lookup' with do_sample must run the distribution-
    preserving speculative sampler, not silently fall through to the plain
    sampling loop (ADVICE r4)."""
    from unittest.mock import patch

    import jax
    import jax.numpy as jnp

    import eilev_tpu.generation.speculative as spec_mod
    from eilev_tpu.generation import GenerationConfig
    from eilev_tpu.generation.text_lm import TextLM

    path, _ = opt_checkpoint
    lm = TextLM(path, dtype=jnp.float32)
    gen_cfg = GenerationConfig(
        max_new_tokens=5, pad_token_id=lm.tokenizer.pad_token_id,
        eos_token_id=(0,), do_sample=True, temperature=1.3,
    )
    with patch.object(
        spec_mod, "prompt_lookup_sample_decode",
        wraps=spec_mod.prompt_lookup_sample_decode,
    ) as spy:
        texts = lm.generate(
            ["The camera wearer opens a drawer and the camera wearer opens"],
            gen_cfg, rng=jax.random.PRNGKey(1), draft="prompt_lookup",
        )
    assert spy.call_count == 1
    assert len(texts) == 1
