"""Text-only LM generation: drive a bare decoder-only LM through the same
compiled decoding loops as VideoBLIP.

Role: the reference shells out to Llama-2-chat for its sentence-ification
utilities (scripts/ego4d/generate_std_sent.py:24-45, scripts/epic-kitchens/
transform_to_full_sent.py:16-36, the baselines' full-sentence generators).
:class:`TextLM` runs those exact recipes from local checkpoints: LLaMA-family
(the reference's model, via models/llama.py) and OPT-family decoders.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import LlamaConfig, OPTConfig, VideoBlipConfig
from ..models.llama import LlamaForCausalLM, convert_llama, llama_config_from_hf
from ..models.opt import OPTForCausalLM
from .config import GenerationConfig
from .decoding import (
    _beam_search_decoder_only,
    _greedy_sample_decoder_only,
    _resolve_lengths,
    _validate_num_return_sequences,
)


class _TextOnlyModule(nn.Module):
    """Adapter exposing the VideoBlip method surface the decoding loops use."""

    config: VideoBlipConfig  # text_config is what matters
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        lm_cls = (
            LlamaForCausalLM
            if isinstance(self.config.text_config, LlamaConfig)
            else OPTForCausalLM
        )
        self.language_model = lm_cls(
            self.config.text_config, dtype=self.dtype, name="language_model"
        )

    def embed_and_scatter(self, input_ids, pixel_values=None, video_input_mask=None):
        del pixel_values, video_input_mask
        return self.language_model.embed(input_ids)

    def lm_embed(self, input_ids):
        return self.language_model.embed(input_ids)

    def lm_forward(self, inputs_embeds, attention_mask=None, cache=None):
        return self.language_model(inputs_embeds, attention_mask=attention_mask, cache=cache)


class TextLM:
    """Load a local HF decoder-only causal LM dir (LLaMA- or OPT-family) and
    generate text. LLaMA is the reference's model for these workloads
    (generate_std_sent.py:24-45)."""

    def __init__(
        self, path: str, dtype=jnp.bfloat16, int8: bool = False,
        int8_kv: bool = False,
    ):
        """``int8=True`` opts into the weight-only int8 serving path
        (ops/quantization.py) — halves the HBM weight stream decode is bound
        on; logits are near- but not bit-identical to bf16. ``int8_kv=True``
        additionally stores the KV cache in int8, read through the
        GQA-aware Pallas VMEM-dequant kernel (ops/decode_attention.py)."""
        import dataclasses

        from ..models.auto import load_tokenizer
        from ..models.convert import convert_opt, _SD
        from ..ops.quantization import quantize_lm_params

        with open(os.path.join(path, "config.json")) as f:
            hf = json.load(f)
        model_type = hf.get("model_type")
        if model_type == "llama":
            text_cfg: OPTConfig | LlamaConfig = llama_config_from_hf(hf)
        elif model_type == "opt":
            text_cfg = OPTConfig(
                vocab_size=hf["vocab_size"],
                hidden_size=hf["hidden_size"],
                num_hidden_layers=hf["num_hidden_layers"],
                num_attention_heads=hf["num_attention_heads"],
                ffn_dim=hf["ffn_dim"],
                max_position_embeddings=hf["max_position_embeddings"],
                word_embed_proj_dim=hf.get("word_embed_proj_dim", hf["hidden_size"]),
                do_layer_norm_before=hf.get("do_layer_norm_before", True),
                activation_function=hf.get("activation_function", "relu"),
                bos_token_id=hf.get("bos_token_id", 2),
                eos_token_id=hf.get("eos_token_id", 2),
                pad_token_id=hf.get("pad_token_id", 1),
            )
        else:
            raise ValueError(
                f"TextLM supports LLaMA- and OPT-family decoder-only checkpoints; "
                f"got {hf.get('model_type')!r}."
            )
        if int8 or int8_kv:
            text_cfg = dataclasses.replace(
                text_cfg, quantize_matmuls=int8, int8_kv_cache=int8_kv
            )
        self.config = VideoBlipConfig(text_config=text_cfg)
        self.module = _TextOnlyModule(self.config, dtype=dtype)
        self.tokenizer = load_tokenizer(path)

        import glob

        import numpy as np
        from safetensors import safe_open

        tensors = {}
        for fpath in sorted(glob.glob(os.path.join(path, "*.safetensors"))):
            with safe_open(fpath, framework="np") as sf:
                for k in sf.keys():
                    tensors[k] = sf.get_tensor(k)
        convert = convert_llama if model_type == "llama" else convert_opt
        params = {"language_model": convert(_SD(tensors), text_cfg)}
        if dtype is not None:
            params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
        if int8:
            params = quantize_lm_params(params)
        self.variables = {"params": params}

    def generate(
        self,
        prompts: list[str],
        generation_config: Optional[GenerationConfig] = None,
        rng=None,
        draft_layers: int = 0,
        draft_tokens: int = 4,
        draft: Optional[str] = None,
        draft_match_len: int = 3,
    ) -> list[str]:
        """``draft_layers > 0``: token-identical speculative greedy decoding
        with the target's first N layers self-drafting ``draft_tokens`` per
        verify pass (generation/speculative.py; OPT and LLaMA).

        Note: repetition_penalty/no_repeat_ngram_size see the GENERATED tokens
        only (the shared decode loops drive the LM via inputs_embeds, where HF
        starts from an empty input_ids); an HF text LM driven via input_ids
        would additionally penalize prompt tokens.
        """
        import numpy as np

        from ..data.collate import _pad_1d

        gen_cfg = generation_config or GenerationConfig(max_new_tokens=64)
        if gen_cfg.eos_token_id is None:
            gen_cfg = gen_cfg.with_eos(self.config.text_config.eos_token_id)
        _validate_num_return_sequences(gen_cfg)
        enc = [self.tokenizer(t)["input_ids"] for t in prompts]
        longest = max(len(e) for e in enc)
        ids = np.stack(
            [_pad_1d(np.asarray(e), longest, self.tokenizer.pad_token_id, "left") for e in enc]
        )
        mask = np.stack(
            [_pad_1d(np.ones(len(e), np.int64), longest, 0, "left") for e in enc]
        )
        embeds = self.module.apply(
            self.variables, jnp.asarray(ids), method=_TextOnlyModule.embed_and_scatter
        )
        # HF counts min_length/max_length over prompt + generated on the
        # inputs_embeds path (decoding._resolve_lengths)
        gen_cfg = _resolve_lengths(gen_cfg, start_len=embeds.shape[1])
        if draft is not None and draft != "prompt_lookup":
            raise ValueError(
                f"unknown draft strategy {draft!r}; supported: 'prompt_lookup'"
            )
        if gen_cfg.num_beams > 1:
            tokens = _beam_search_decoder_only(
                self.module, self.variables, embeds, jnp.asarray(mask), gen_cfg,
                rng if rng is not None else jax.random.PRNGKey(0),
            )
        elif draft == "prompt_lookup":
            # model-free speculative decoding (OPT and LLaMA share the cache
            # contract); greedy is token-identical to the plain loop, sampling
            # is distribution-preserving (decoding.generate routes the same way)
            if gen_cfg.has_logits_processors:
                raise NotImplementedError(
                    "speculative decoding implements plain greedy/sampling; drop "
                    "draft='prompt_lookup' to use repetition_penalty/"
                    "no_repeat_ngram_size/min_new_tokens"
                )
            if gen_cfg.num_return_sequences > 1:
                raise NotImplementedError(
                    "speculative decoding returns one sequence per input; drop "
                    "draft='prompt_lookup' to use num_return_sequences > 1"
                )
            from ..configs import OPTConfig as _OPTConfig
            from ..models.llama import LlamaForCausalLM
            from ..models.opt import OPTForCausalLM
            from .speculative import (
                build_lookup_corpus,
                prompt_lookup_greedy_decode,
                prompt_lookup_sample_decode,
            )

            tcfg = self.config.text_config
            cls = OPTForCausalLM if isinstance(tcfg, _OPTConfig) else LlamaForCausalLM
            target = cls(tcfg, dtype=self.module.dtype)
            corpus = build_lookup_corpus(jnp.asarray(ids), jnp.asarray(mask))
            if gen_cfg.do_sample:
                tokens = prompt_lookup_sample_decode(
                    target, self.variables["params"]["language_model"], corpus,
                    embeds, jnp.asarray(mask), gen_cfg,
                    rng if rng is not None else jax.random.PRNGKey(0),
                    gamma=draft_tokens, match_len=draft_match_len,
                )
            else:
                tokens = prompt_lookup_greedy_decode(
                    target, self.variables["params"]["language_model"], corpus,
                    embeds, jnp.asarray(mask), gen_cfg,
                    gamma=draft_tokens, match_len=draft_match_len,
                )
        elif draft_layers and not gen_cfg.do_sample:
            if gen_cfg.has_logits_processors:
                raise NotImplementedError(
                    "speculative decoding implements plain greedy; drop "
                    "draft_layers to use repetition_penalty/"
                    "no_repeat_ngram_size/min_new_tokens"
                )
            from ..configs import OPTConfig as _OPTConfig
            from ..models.llama import LlamaForCausalLM
            from ..models.opt import OPTForCausalLM
            from .speculative import make_self_draft, speculative_greedy_decode

            tcfg = self.config.text_config
            lm_params = self.variables["params"]["language_model"]
            draft_model, draft_params = make_self_draft(
                tcfg, lm_params, draft_layers, self.module.dtype
            )
            cls = OPTForCausalLM if isinstance(tcfg, _OPTConfig) else LlamaForCausalLM
            target = cls(tcfg, dtype=self.module.dtype)
            tokens = speculative_greedy_decode(
                target, lm_params, draft_model, draft_params,
                embeds, jnp.asarray(mask), gen_cfg, gamma=draft_tokens,
            )
        else:
            tokens = _greedy_sample_decoder_only(
                self.module,
                self.variables,
                embeds,
                jnp.asarray(mask),
                gen_cfg,
                rng if rng is not None else jax.random.PRNGKey(0),
            )
        return self.tokenizer.batch_decode(np.asarray(tokens), skip_special_tokens=True)
