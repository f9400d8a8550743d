"""ChatSession (serving/session.py): incremental multi-turn prefill must be
token-identical to from-scratch ``generate`` on the full prompt, whether the
cached prefix is reused or the session falls back to a fresh prefill."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eilev_tpu import configs
from eilev_tpu.generation import GenerationConfig, generate
from eilev_tpu.models import VideoBlipForConditionalGeneration
from eilev_tpu.serving import ChatSession


@pytest.fixture(scope="module")
def world():
    cfg = configs.tiny_config(text_model="opt")
    model = VideoBlipForConditionalGeneration(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    img = cfg.vision_config.image_size
    q = cfg.num_query_tokens

    def make_video(seed):
        return np.random.default_rng(seed).normal(size=(1, 3, 2, img, img)).astype(
            np.float32
        )

    def make_turn_tokens(seed, n, with_video):
        """(ids, vim) for one turn's delta: optional video pads + random text."""
        r = np.random.default_rng(seed)
        ids = r.integers(4, cfg.text_config.vocab_size, size=(n,))
        vim = np.zeros((n,), np.int64)
        if with_video:
            vim[:q] = 1
        return ids, vim

    ids0, vim0 = make_turn_tokens(0, 12, True)
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.asarray(ids0[None]),
        pixel_values=jnp.asarray(make_video(0)),
        video_input_mask=jnp.asarray(vim0[None]),
    )["params"]
    return cfg, model, {"params": params}, make_video, make_turn_tokens


def _reference(model, variables, gen_cfg, ids, pixel, vim):
    out = np.asarray(
        generate(
            model,
            variables,
            input_ids=jnp.asarray(ids[None]),
            pixel_values=jnp.asarray(pixel) if pixel is not None else None,
            video_input_mask=jnp.asarray(vim[None]) if pixel is not None else None,
            generation_config=gen_cfg,
        )
    )[0]
    # trim trailing pads (generate returns the padded max_new_tokens buffer)
    pad = gen_cfg.pad_token_id
    m = len(out)
    while m > 0 and out[m - 1] == pad:
        m -= 1
    return out[:m]


@pytest.mark.slow
def test_session_multi_turn_matches_generate(world):
    """Three turns — new text, then new video+text — every reply must equal a
    from-scratch generate on the cumulative prompt, with the prefix reused."""
    cfg, model, variables, make_video, make_turn = world
    gen_cfg = GenerationConfig(max_new_tokens=6, pad_token_id=1)
    sess = ChatSession(model, variables, gen_cfg, max_len=128, bucket=8)

    ids, vim = make_turn(1, 12, True)
    videos = make_video(1)

    for turn, (seed, n, with_video) in enumerate(
        [(None, None, None), (2, 7, False), (3, 9, True)]
    ):
        if turn > 0:
            extra_ids, extra_vim = make_turn(seed, n, with_video)
            ids = np.concatenate([ids, extra_ids])
            vim = np.concatenate([vim, extra_vim])
            if with_video:
                videos = np.concatenate([videos, make_video(seed)])
        reply = sess.turn(ids, videos, vim)
        assert sess.reused_last_turn == (turn > 0)
        ref = _reference(model, variables, gen_cfg, ids, videos, vim)
        np.testing.assert_array_equal(reply, ref, err_msg=f"turn {turn}")
        # the next turn's prompt continues from prompt + the generated reply
        ids = np.concatenate([ids, reply.astype(ids.dtype)])
        vim = np.concatenate([vim, np.zeros((len(reply),), vim.dtype)])


@pytest.mark.slow
def test_session_mid_stream_edit_rolls_back(world):
    """Editing a mid-conversation token (e.g. the retokenized reply merged
    differently) must ROLL the cache BACK to the common prefix, keep reusing
    it, and still produce the from-scratch output."""
    cfg, model, variables, make_video, make_turn = world
    gen_cfg = GenerationConfig(max_new_tokens=5, pad_token_id=1)
    sess = ChatSession(model, variables, gen_cfg, max_len=128, bucket=8)

    ids, vim = make_turn(10, 12, True)
    videos = make_video(10)
    reply = sess.turn(ids, videos, vim)
    ids = np.concatenate([ids, reply.astype(ids.dtype), [5, 6, 7]])
    vim = np.concatenate([vim, np.zeros((len(reply) + 3,), vim.dtype)])
    edit_at = len(ids) - len(reply) - 3  # first reply token: past the videos
    ids[edit_at] = (ids[edit_at] + 1) % 60 + 4  # "retokenized differently"

    reply2 = sess.turn(ids, videos, vim)
    assert sess.reused_last_turn
    assert sess.last_turn_rolled_back == len(reply) - 0
    assert sess.last_turn_appended == len(reply) + 3
    ref = _reference(model, variables, gen_cfg, ids, videos, vim)
    np.testing.assert_array_equal(reply2, ref)


def test_session_first_token_edit_resets(world):
    """Divergence at position 0 leaves nothing to reuse: full reset path."""
    cfg, model, variables, make_video, make_turn = world
    gen_cfg = GenerationConfig(max_new_tokens=5, pad_token_id=1)
    sess = ChatSession(model, variables, gen_cfg, max_len=128, bucket=8)

    ids, vim = make_turn(11, 10, False)
    sess.turn(ids, None, vim)
    ids2 = ids.copy()
    ids2[0] = (ids2[0] + 1) % 60 + 4
    ids2 = np.concatenate([ids2, [8, 9]])
    vim2 = np.concatenate([vim, np.zeros((2,), vim.dtype)])
    reply = sess.turn(ids2, None, vim2)
    assert not sess.reused_last_turn
    ref = _reference(model, variables, gen_cfg, ids2, None, vim2)
    np.testing.assert_array_equal(reply, ref)


def test_session_overflow_raises(world):
    cfg, model, variables, make_video, make_turn = world
    gen_cfg = GenerationConfig(max_new_tokens=8, pad_token_id=1)
    sess = ChatSession(model, variables, gen_cfg, max_len=16, bucket=8)
    ids, vim = make_turn(20, 12, True)
    with pytest.raises(ValueError, match="max_len"):
        sess.turn(ids, make_video(20), vim)


def test_session_rejects_beam(world):
    cfg, model, variables, make_video, make_turn = world
    with pytest.raises(ValueError, match="greedy"):
        ChatSession(
            model, variables, GenerationConfig(num_beams=3, pad_token_id=1)
        )


def test_session_turn_stream_matches_turn(world):
    """Streamed turns emit the same tokens as blocking turns, and the cache
    invariant survives the mid-chunk eos (pad slots masked back out) so the
    NEXT turn still reuses the stream."""
    cfg, model, variables, make_video, make_turn = world
    gen_cfg = GenerationConfig(max_new_tokens=6, pad_token_id=1)

    ids, vim = make_turn(30, 12, True)
    videos = make_video(30)

    blocking = ChatSession(model, variables, gen_cfg, max_len=128, bucket=8)
    streaming = ChatSession(model, variables, gen_cfg, max_len=128, bucket=8)

    for turn in range(3):
        if turn > 0:
            extra_ids, extra_vim = make_turn(31 + turn, 5, False)
            ids = np.concatenate([ids, extra_ids])
            vim = np.concatenate([vim, extra_vim])
        ref = blocking.turn(ids, videos, vim)
        chunks = list(streaming.turn_stream(ids, videos, vim, chunk=4))
        got = np.concatenate(chunks) if chunks else np.zeros((0,), np.int32)
        np.testing.assert_array_equal(got, ref, err_msg=f"turn {turn}")
        assert streaming.reused_last_turn == (turn > 0)
        ids = np.concatenate([ids, ref.astype(ids.dtype)])
        vim = np.concatenate([vim, np.zeros((len(ref),), vim.dtype)])


@pytest.mark.slow
def test_session_turn_stream_bf16_dtype_boundary(world):
    """bf16 model: the fp32 logits from the append prefill must re-enter the
    model-dtype _decode_chunk carry (regression: scan carry dtype mismatch)."""
    cfg, model_fp32, variables, make_video, make_turn = world
    model = VideoBlipForConditionalGeneration(cfg, dtype=jnp.bfloat16)
    gen_cfg = GenerationConfig(max_new_tokens=4, pad_token_id=1)
    sess = ChatSession(model, variables, gen_cfg, max_len=128, bucket=8)
    ids, vim = make_turn(40, 12, True)
    chunks = list(sess.turn_stream(ids, make_video(40), vim, chunk=3))
    assert sum(len(c) for c in chunks) > 0
