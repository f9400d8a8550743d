"""Multi-turn chat sessions with incremental prefill (KV reuse across turns).

The reference demo rebuilds the FULL interleaved prompt every turn and
re-prefills it from scratch (/root/reference/demo/eilev_demo.py:52-67 — each
``respond`` call re-encodes every video and every token of the conversation
so far). This module keeps the session's KV cache alive between turns and
prefills only what actually changed:

  - The caller passes the full prompt arrays each turn (exactly what the
    prompt builder produces). The session computes the longest common prefix
    against the token stream resident in the cache, ROLLS BACK the diverged
    tail (typically a few tokens where retokenizing the generated reply text
    merged differently), and appends just the suffix via the multi-token
    ``cache_append`` forward (models/opt.py — the traced-offset causal bias
    built for speculative verify blocks), encoding only the suffix's videos.
  - Rollback is a mask edit, not a copy: the stale tokens' cache slots get
    their attention-mask bits zeroed and the real-token position counter
    rewinds; the slots themselves are abandoned (positions derive from the
    mask cumsum, so decoding stays exact). The scalar cache index only grows
    — capacity accounting is against slots consumed, not tokens resident.
  - Whatever the diff looks like, the result is token-identical to a
    from-scratch ``generate`` call on the full prompt
    (tests/serving/test_session.py).
  - Suffixes are right-padded to ``bucket`` widths so compile count is
    bounded by max_len/bucket; the decode loop is one donated-cache jit with
    eos early exit, so pad tokens never enter the resident stream.

Decoder-only LMs, greedy decoding (the streaming/chat path; beam search
re-prefills by design — its per-beam cache tiling is turn-local).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import OPTConfig
from ..generation.config import GenerationConfig
from ..generation.decoding import _decode_chunk, _is_eos
from ..models import opt as opt_mod
from ..models.video_blip import VideoBlipForConditionalGeneration as VB


@functools.partial(jax.jit, static_argnames=("model",), donate_argnums=(2,))
def _append_prefill(
    model: VB,
    variables,
    cache,
    embeds: jax.Array,  # (1, W, D) right-padded delta, videos already scattered
    mask: jax.Array,  # (1, W) 0/1
    last_idx: jax.Array,  # () int32 — index of the delta's last REAL token
):
    """Append the delta into the session cache; return its last real logits."""
    logits, cache = model.apply(
        variables, embeds, attention_mask=mask, cache=cache,
        cache_append=True, method=VB.lm_forward,
    )
    last_logits = jax.lax.dynamic_index_in_dim(logits, last_idx, axis=1)[:, 0]
    return last_logits.astype(jnp.float32), cache


@functools.partial(jax.jit, donate_argnums=(0,))
def _mask_rollback(cache, keep: jax.Array, new_pos: jax.Array):
    """Zero the attention-mask bits of abandoned slots and rewind ``pos``."""
    cache = dict(cache)
    cache["mask"] = cache["mask"] * keep.astype(cache["mask"].dtype)
    cache["pos"] = new_pos.astype(cache["pos"].dtype)
    return cache


@functools.partial(jax.jit, static_argnames=("model", "gen_cfg"), donate_argnums=(2,))
def _decode_until_eos(
    model: VB,
    variables,
    cache,
    last_logits: jax.Array,  # (1, vocab)
    gen_cfg: GenerationConfig,
):
    """Greedy decode with eos early exit, threading the SESSION cache.

    Unlike the engine's chunked scan, the while_loop stops the step AFTER the
    eos token was emitted+appended, so nothing past the eos ever lands in the
    cache — the invariant that lets the next turn extend the stream.
    """
    max_new = gen_cfg.max_new_tokens
    out_buf = jnp.full((1, max_new), gen_cfg.pad_token_id, jnp.int32)

    def cond(carry):
        step, _, _, finished, _ = carry
        return jnp.logical_and(step < max_new, ~jnp.all(finished))

    def body(carry):
        step, cache, logits, finished, out = carry
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        finished = finished | _is_eos(tok, gen_cfg)
        out = jax.lax.dynamic_update_slice(out, tok[:, None], (0, step))
        embeds = model.apply(variables, tok[:, None], method=VB.lm_embed)
        next_logits, cache = model.apply(
            variables, embeds, attention_mask=jnp.ones((1, 1), jnp.int32),
            cache=cache, method=VB.lm_forward,
        )
        return (step + 1, cache, next_logits[:, -1].astype(jnp.float32), finished, out)

    carry = (jnp.zeros((), jnp.int32), cache, last_logits,
             jnp.zeros((1,), bool), out_buf)
    steps, cache, _, _, out = jax.lax.while_loop(cond, body, carry)
    return out, cache, steps


class ChatSession:
    """Incremental multi-turn generation over one persistent KV cache."""

    def __init__(
        self,
        model: VB,
        variables,
        generation_config: GenerationConfig,
        *,
        max_len: int = 2048,
        bucket: int = 64,
    ):
        if not isinstance(model.config.text_config, OPTConfig):
            raise ValueError("ChatSession supports decoder-only (OPT-family) LMs")
        if generation_config.num_beams > 1 or generation_config.do_sample:
            raise ValueError("ChatSession is greedy-only (beam/sampling re-prefill)")
        if generation_config.has_logits_processors:
            raise NotImplementedError(
                "ChatSession's incremental decode does not implement "
                "repetition_penalty/no_repeat_ngram_size/min_new_tokens"
            )
        gen_cfg = generation_config
        if gen_cfg.eos_token_id is None:
            gen_cfg = gen_cfg.with_eos(model.config.text_config.eos_token_id)
        self.model = model
        self.variables = variables
        self.gen_cfg = gen_cfg
        self.max_len = max_len
        self.bucket = bucket
        self.reused_last_turn = False
        self.last_turn_appended = 0
        self.last_turn_rolled_back = 0
        self.reset()

    def reset(self) -> None:
        self._cache = None
        # the token stream resident in the cache, its video mask, and the
        # cache slot each token occupies (right-padding + abandoned rollback
        # slots make slot != position)
        self._ids: np.ndarray = np.zeros((0,), np.int64)
        self._vim: np.ndarray = np.zeros((0,), np.int64)
        self._slots: np.ndarray = np.zeros((0,), np.int64)
        self._index = 0  # host mirror of cache["index"] (slots consumed)

    # -- internals ----------------------------------------------------------

    def _fresh_cache(self):
        tcfg = self.model.config.text_config
        return opt_mod.init_cache(tcfg, 1, self.max_len, dtype=self.model.dtype)

    def _lcp(self, full_ids: np.ndarray) -> int:
        n = min(len(self._ids), len(full_ids))
        if n == 0:
            return 0
        neq = self._ids[:n] != full_ids[:n]
        return int(np.argmax(neq)) if neq.any() else n

    def _rollback(self, n_keep: int) -> None:
        keep = np.ones((1, self.max_len), np.int32)
        keep[0, self._slots[n_keep:]] = 0
        self._cache = _mask_rollback(
            self._cache, jnp.asarray(keep), jnp.full((1,), n_keep, jnp.int32)
        )
        self._ids = self._ids[:n_keep]
        self._vim = self._vim[:n_keep]
        self._slots = self._slots[:n_keep]

    def _append(self, ids: np.ndarray, pixel_values, vim: np.ndarray):
        """Right-pad the delta to a bucket width and append it to the cache."""
        n = len(ids)
        pad = -n % self.bucket
        w = n + pad
        tcfg = self.model.config.text_config
        ids_p = np.concatenate([ids, np.full((pad,), tcfg.pad_token_id, ids.dtype)])
        vim_p = np.concatenate([vim, np.zeros((pad,), vim.dtype)])
        mask = np.concatenate([np.ones((n,), np.int32), np.zeros((pad,), np.int32)])
        embeds = self.model.apply(
            self.variables,
            jnp.asarray(ids_p)[None],
            jnp.asarray(pixel_values) if pixel_values is not None else None,
            jnp.asarray(vim_p)[None],
            method=VB.embed_and_scatter,
        )
        last_logits, self._cache = _append_prefill(
            self.model, self.variables, self._cache, embeds,
            jnp.asarray(mask)[None], jnp.asarray(n - 1, jnp.int32),
        )
        self._slots = np.concatenate(
            [self._slots, self._index + np.arange(n, dtype=np.int64)]
        )
        self._index += w
        return last_logits

    # -- public -------------------------------------------------------------

    def _begin_turn(self, input_ids, pixel_values, video_input_mask):
        """Shared turn prologue: LCP diff, rollback/reset, budget check, and
        the delta append. Returns (last_logits, full_ids, vim, n_delta)."""
        full_ids = np.asarray(input_ids).reshape(-1)
        q = self.model.config.num_query_tokens
        vim = (
            np.asarray(video_input_mask).reshape(-1)
            if video_input_mask is not None
            else np.zeros_like(full_ids)
        )

        n_lcp = self._lcp(full_ids) if self._cache is not None else 0
        if n_lcp == 0 or len(full_ids) == n_lcp:
            # nothing reusable, or no new tokens at all: fresh prefill
            # (the latter would otherwise append an empty delta)
            self.reset()
            self._cache = self._fresh_cache()
            self.reused_last_turn = False
            self.last_turn_rolled_back = 0
            n_lcp = 0
        else:
            self.last_turn_rolled_back = len(self._ids) - n_lcp
            if n_lcp < len(self._ids):
                self._rollback(n_lcp)
            self.reused_last_turn = True

        delta_ids = full_ids[n_lcp:]
        delta_vim = vim[n_lcp:]
        new_videos = None
        if pixel_values is not None and int(delta_vim.sum()) > 0:
            n_resident = int(self._vim.sum()) // q
            n_new = int(delta_vim.sum()) // q
            new_videos = np.asarray(pixel_values)[n_resident:][:n_new]

        if len(delta_ids) == 0:
            raise ValueError("turn() called with no new tokens")
        pad = -len(delta_ids) % self.bucket
        budget = self._index + len(delta_ids) + pad + self.gen_cfg.max_new_tokens
        if budget > self.max_len:
            raise ValueError(
                f"conversation needs {budget} cache slots, max_len={self.max_len}"
            )

        last_logits = self._append(delta_ids, new_videos, delta_vim)
        self.last_turn_appended = len(delta_ids)
        return last_logits, full_ids, vim

    def _finish_turn(self, full_ids, vim, reply: np.ndarray) -> None:
        """Record the reply tokens (already resident in the cache) in the
        session's token stream."""
        m = len(reply)
        self._ids = np.concatenate([full_ids, reply.astype(full_ids.dtype)])
        self._vim = np.concatenate([vim, np.zeros((m,), vim.dtype)])
        self._slots = np.concatenate(
            [self._slots, self._index + np.arange(m, dtype=np.int64)]
        )
        self._index += m

    def turn(
        self,
        input_ids: np.ndarray,
        pixel_values: Optional[np.ndarray] = None,
        video_input_mask: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Generate a reply to the FULL prompt-so-far; reuse the cached prefix.

        :param input_ids: (P,) the whole conversation's token ids (prompt
            builder output), including everything from previous turns.
        :param pixel_values: (V, C, T, H, W) ALL videos referenced so far.
        :param video_input_mask: (P,) aligned with input_ids.
        :returns: (m,) generated token ids (eos included, no padding).
        """
        last_logits, full_ids, vim = self._begin_turn(
            input_ids, pixel_values, video_input_mask
        )
        out, self._cache, steps = _decode_until_eos(
            self.model, self.variables, self._cache, last_logits, self.gen_cfg
        )
        reply = np.asarray(out)[0, : int(steps)]
        self._finish_turn(full_ids, vim, reply)
        return reply

    def turn_stream(
        self,
        input_ids: np.ndarray,
        pixel_values: Optional[np.ndarray] = None,
        video_input_mask: Optional[np.ndarray] = None,
        chunk: int = 8,
    ):
        """Streaming :meth:`turn`: yields (k,) token chunks as they decode.

        Tokens decode ``chunk`` steps per device dispatch through the same
        donated-cache scan the static streaming path uses. The scan appends
        every step's token to the cache — including the pad steps after eos
        inside the final chunk — so on completion the pads' slots are masked
        back out (the same mechanism as LCP rollback), restoring the
        resident-stream invariant for the next turn.
        """
        last_logits, full_ids, vim = self._begin_turn(
            input_ids, pixel_values, video_input_mask
        )
        gen_cfg = self.gen_cfg
        max_new = gen_cfg.max_new_tokens
        cache = self._cache
        self._cache = None  # donated: never reuse the stale reference
        finished = jnp.zeros((1,), bool)
        rng = jax.random.PRNGKey(0)
        # _decode_chunk carries model-dtype logits (the fp32 cast in
        # _append_prefill is lossless over bf16 values, so argmax agrees)
        logits = last_logits.astype(self.model.dtype)
        emitted: list[int] = []
        appended = 0
        done = False
        while appended < max_new and not done:
            steps = min(chunk, max_new - appended)
            cache, logits, finished, rng, toks = _decode_chunk(
                self.model, self.variables, cache, logits, finished,
                gen_cfg, rng, steps,
            )
            appended += steps
            row = np.asarray(toks)[0]
            done = bool(np.asarray(finished)[0])
            eos_ids = set(gen_cfg.eos_token_id or ())
            fresh = []
            for t in row:
                if len(emitted) + len(fresh) >= max_new:
                    break
                fresh.append(int(t))
                if int(t) in eos_ids:
                    done = True
                    break
            emitted.extend(fresh)
            if fresh:
                yield np.asarray(fresh, np.int32)
        self._cache = cache
        m = len(emitted)
        # mask out the pad steps the last chunk appended past the eos
        stale = appended - m
        if stale > 0:
            keep = np.ones((1, self.max_len), np.int32)
            keep[0, self._index + m : self._index + appended] = 0
            self._cache = _mask_rollback(
                self._cache, jnp.asarray(keep),
                jnp.full((1,), len(full_ids) + m, jnp.int32),
            )
        reply = np.asarray(emitted, np.int64)
        self._finish_turn(full_ids, vim, reply)
        self._index += stale  # the stale slots are consumed, just masked
