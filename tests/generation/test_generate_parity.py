"""Generation parity vs HF ``generate`` on tiny random-weight oracles.

Covers the decoding strategies the reference tests exercise
(/root/reference/tests/model/test_model_v2.py:189-295): greedy, sampling, beam -
with token-identical greedy/beam checks (stronger than the reference's run-only
tests). Also covers the OPT newline-eos quirk (reference demo/eilev_demo.py:61-65)
and left-padded batched generation (generate_narration_texts.py:230).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from eilev_tpu.generation import GenerationConfig, classify, generate
from eilev_tpu.models.video_blip import VideoBlipForConditionalGeneration

from ..models.hf_util import make_oracle

pytestmark = pytest.mark.filterwarnings("ignore")


@pytest.fixture(scope="module")
def opt_oracle():
    return make_oracle("opt")


@pytest.fixture(scope="module")
def opt_setup(opt_oracle):
    model, cfg, params = opt_oracle
    rng = np.random.default_rng(7)
    b, v_per, t, s = 2, 2, 2, 20
    img = cfg.vision_config.image_size
    pixel = rng.normal(size=(b * v_per, 3, t, img, img)).astype(np.float32)
    ids = rng.integers(4, cfg.text_config.vocab_size, size=(b, s))
    mask = np.ones((b, s), np.int64)
    # left padding on row 0, like the eval scripts
    ids[0, :3] = 1
    mask[0, :3] = 0
    vim = np.zeros((b, s), np.int64)
    vim[:, 4 : 4 + v_per * cfg.num_query_tokens] = 1
    m = VideoBlipForConditionalGeneration(cfg)
    return model, cfg, params, m, ids, mask, pixel, vim


def _hf_generate(model, ids, mask, pixel, vim, **kwargs):
    with torch.no_grad():
        return (
            model.generate(
                input_ids=torch.tensor(ids),
                attention_mask=torch.tensor(mask),
                pixel_values=torch.tensor(pixel),
                video_input_mask=torch.tensor(vim),
                **kwargs,
            )
            .cpu()
            .numpy()
        )


def test_greedy_token_identical(opt_setup):
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    max_new = 8
    ref = _hf_generate(model, ids, mask, pixel, vim, max_new_tokens=max_new, do_sample=False)
    ours = np.asarray(
        generate(
            m,
            {"params": params},
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
            pixel_values=jnp.asarray(pixel),
            video_input_mask=jnp.asarray(vim),
            generation_config=GenerationConfig(
                max_new_tokens=max_new, pad_token_id=cfg.text_config.pad_token_id
            ),
        )
    )
    # HF may stop early when all rows hit eos; compare the overlap, padding-aware
    n = min(ref.shape[1], ours.shape[1])
    np.testing.assert_array_equal(ours[:, :n], ref[:, :n])


def test_greedy_custom_eos(opt_setup):
    """OPT newline-eos quirk: pass a non-default eos and HF/ours must agree."""
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    max_new = 8
    # pick the token HF greedy emits at step 3 as a custom eos to force early stop
    probe = _hf_generate(model, ids, mask, pixel, vim, max_new_tokens=max_new, do_sample=False)
    eos = int(probe[0, 3])
    ref = _hf_generate(
        model, ids, mask, pixel, vim, max_new_tokens=max_new, do_sample=False, eos_token_id=eos,
        pad_token_id=cfg.text_config.pad_token_id,
    )
    ours = np.asarray(
        generate(
            m,
            {"params": params},
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
            pixel_values=jnp.asarray(pixel),
            video_input_mask=jnp.asarray(vim),
            generation_config=GenerationConfig(
                max_new_tokens=max_new,
                pad_token_id=cfg.text_config.pad_token_id,
                eos_token_id=(eos,),
            ),
        )
    )
    n = min(ref.shape[1], ours.shape[1])
    np.testing.assert_array_equal(ours[:, :n], ref[:, :n])
    # everything after an eos must be pad
    for row in np.asarray(ours):
        hits = np.where(row == eos)[0]
        if len(hits):
            assert (row[hits[0] + 1 :] == cfg.text_config.pad_token_id).all()


@pytest.mark.parametrize("length_penalty", [1.0, -1.0])
def test_beam_token_identical(opt_setup, length_penalty):
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    max_new = 8
    ref = _hf_generate(
        model,
        ids,
        mask,
        pixel,
        vim,
        max_new_tokens=max_new,
        do_sample=False,
        num_beams=3,
        length_penalty=length_penalty,
        pad_token_id=cfg.text_config.pad_token_id,
    )
    ours = np.asarray(
        generate(
            m,
            {"params": params},
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
            pixel_values=jnp.asarray(pixel),
            video_input_mask=jnp.asarray(vim),
            generation_config=GenerationConfig(
                max_new_tokens=max_new,
                num_beams=3,
                length_penalty=length_penalty,
                pad_token_id=cfg.text_config.pad_token_id,
            ),
        )
    )
    n = min(ref.shape[1], ours.shape[1])
    np.testing.assert_array_equal(ours[:, :n], ref[:, :n])


def _torch_contrastive(model, ids, mask, pixel, vim, max_new, k, alpha, eos_ids, pad):
    """Contrastive-search oracle over the reference model's torch numerics.

    transformers 4.57 moved ``_contrastive_search`` to a remote
    ``custom_generate`` repo (unreachable offline), so the SELECTION RULE is
    re-derived here from the published algorithm (Su et al. 2022 / the HF
    docs: score = (1-alpha)*p(candidate) - alpha*max cossim(candidate
    hidden, context hiddens), hidden = ``hidden_states[-1]``) while every
    logit/hidden comes from the reference model's own forward. Cache-free —
    full forwards each step on the growing sequence (tiny model)."""
    import torch.nn.functional as F

    with torch.no_grad():
        image_embeds = model.vision_model(
            torch.tensor(pixel), return_dict=True
        ).last_hidden_state
        image_attention_mask = torch.ones(image_embeds.size()[:-1], dtype=torch.long)
        query_tokens = model.query_tokens.expand(image_embeds.shape[0], -1, -1)
        query_output = model.qformer(
            query_embeds=query_tokens,
            encoder_hidden_states=image_embeds,
            encoder_attention_mask=image_attention_mask,
            return_dict=True,
        ).last_hidden_state
        video_features = model.language_projection(
            query_output.view(
                pixel.shape[0] * model.config.num_query_tokens, -1
            )
        )
        embeds = model.get_input_embeddings()(torch.tensor(ids))
        embeds[torch.tensor(vim).bool()] = video_features
        lm = model.language_model
        attn = torch.tensor(mask)
        b = ids.shape[0]
        finished = torch.zeros(b, dtype=torch.bool)
        out_tokens = []
        for _ in range(max_new):
            out = lm(
                inputs_embeds=embeds, attention_mask=attn,
                output_hidden_states=True, return_dict=True, use_cache=False,
            )
            logits = out.logits[:, -1].float()
            ctx_hidden = out.hidden_states[-1]  # (B, T, D)
            probs = F.softmax(logits, dim=-1)
            top_p, top_ids = probs.topk(k, dim=-1)  # (B, k)

            cand_embeds = lm.get_input_embeddings()(top_ids)  # (B, k, E)
            t = embeds.shape[1]
            big = torch.cat(
                [
                    embeds.repeat_interleave(k, dim=0),
                    cand_embeds.reshape(b * k, 1, -1),
                ],
                dim=1,
            )
            big_attn = torch.cat(
                [
                    attn.repeat_interleave(k, dim=0),
                    torch.ones(b * k, 1, dtype=attn.dtype),
                ],
                dim=1,
            )
            cand_out = lm(
                inputs_embeds=big, attention_mask=big_attn,
                output_hidden_states=True, return_dict=True, use_cache=False,
            )
            cand_hidden = cand_out.hidden_states[-1][:, -1]  # (B*k, D)
            cos = F.cosine_similarity(
                cand_hidden.unsqueeze(1).float(),
                ctx_hidden.repeat_interleave(k, dim=0).float(),
                dim=-1,
            )  # (B*k, T)
            penalty = cos.max(dim=-1).values.view(b, k)
            score = (1.0 - alpha) * top_p - alpha * penalty
            sel = score.argmax(dim=-1)  # (B,)
            tok = top_ids.gather(1, sel[:, None])[:, 0]
            tok = torch.where(finished, torch.tensor(pad), tok)
            out_tokens.append(tok.clone())
            finished |= sum((tok == e) for e in eos_ids).bool() if eos_ids else torch.zeros_like(finished)
            embeds = torch.cat(
                [embeds, lm.get_input_embeddings()(tok[:, None])], dim=1
            )
            attn = torch.cat([attn, torch.ones(b, 1, dtype=attn.dtype)], dim=1)
            if bool(finished.all()):
                break
        return torch.stack(out_tokens, dim=1).numpy()


@pytest.mark.parametrize("top_k,alpha", [(4, 0.6), (6, 0.3)])
def test_contrastive_token_identical(opt_setup, top_k, alpha):
    """Contrastive search (penalty_alpha): token-identical vs a torch oracle
    built on the reference model's forward (see _torch_contrastive).
    Exercises the shared-prefix candidate expansion + hidden-state
    degeneration penalty (decoding._contrastive_decoder_only)."""
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    max_new = 8
    eos = cfg.text_config.eos_token_id
    ref = _torch_contrastive(
        model, ids, mask, pixel, vim, max_new, top_k, alpha,
        (eos,), cfg.text_config.pad_token_id,
    )
    ours = np.asarray(
        generate(
            m,
            {"params": params},
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
            pixel_values=jnp.asarray(pixel),
            video_input_mask=jnp.asarray(vim),
            generation_config=GenerationConfig(
                max_new_tokens=max_new,
                pad_token_id=cfg.text_config.pad_token_id,
                penalty_alpha=alpha,
                top_k=top_k,
            ),
        )
    )
    n = min(ref.shape[1], ours.shape[1])
    np.testing.assert_array_equal(ours[:, :n], ref[:, :n])


def test_contrastive_custom_eos_and_t5_rejection(opt_setup):
    """Early-eos rows pad out after stopping; T5 contrastive raises
    actionably (decoder-only implementation)."""
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    max_new = 8
    pad = cfg.text_config.pad_token_id
    probe = _torch_contrastive(
        model, ids, mask, pixel, vim, max_new, 4, 0.6, (), pad
    )
    eos = int(probe[0, 2])
    ref = _torch_contrastive(
        model, ids, mask, pixel, vim, max_new, 4, 0.6, (eos,), pad
    )
    ours = np.asarray(
        generate(
            m,
            {"params": params},
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
            pixel_values=jnp.asarray(pixel),
            video_input_mask=jnp.asarray(vim),
            generation_config=GenerationConfig(
                max_new_tokens=max_new,
                pad_token_id=pad,
                penalty_alpha=0.6,
                top_k=4,
                eos_token_id=(eos,),
            ),
        )
    )
    n = min(ref.shape[1], ours.shape[1])
    np.testing.assert_array_equal(ours[:, :n], ref[:, :n])
    for row in ours:
        hits = np.where(row == eos)[0]
        if len(hits):
            assert (row[hits[0] + 1 :] == pad).all()

    from eilev_tpu import configs as cfgs

    t5cfg = cfgs.tiny_config(text_model="t5")
    t5 = VideoBlipForConditionalGeneration(t5cfg)
    with pytest.raises(NotImplementedError, match="contrastive"):
        generate(
            t5,
            {"params": {}},
            input_ids=jnp.asarray(ids),
            generation_config=GenerationConfig(
                max_new_tokens=4, pad_token_id=0, penalty_alpha=0.6, top_k=4
            ),
        )


def _torch_group_beam(model, ids, mask, pixel, vim, max_new, num_beams,
                      num_groups, diversity, length_penalty, eos_ids, pad,
                      num_return=1):
    """Group (diverse) beam-search oracle over the reference model's torch
    numerics. transformers 4.57 removed ``_group_beam_search`` from
    GenerationMixin, but ``BeamSearchScorer`` and
    ``HammingDiversityLogitsProcessor`` remain in-tree; this drives them with
    the removed loop's exact control flow (group-sequential processing,
    ``current_tokens`` frequency penalty, ``reordering_indices``). Cache-free
    full forwards on the growing sequence (tiny model)."""
    import torch.nn.functional as F
    from transformers.generation.beam_search import BeamSearchScorer
    from transformers.generation.logits_process import (
        HammingDiversityLogitsProcessor,
    )

    b = ids.shape[0]
    nb, G = num_beams, num_groups
    ng = nb // G
    with torch.no_grad():
        image_embeds = model.vision_model(
            torch.tensor(pixel), return_dict=True
        ).last_hidden_state
        image_attention_mask = torch.ones(image_embeds.size()[:-1], dtype=torch.long)
        query_tokens = model.query_tokens.expand(image_embeds.shape[0], -1, -1)
        query_output = model.qformer(
            query_embeds=query_tokens,
            encoder_hidden_states=image_embeds,
            encoder_attention_mask=image_attention_mask,
            return_dict=True,
        ).last_hidden_state
        video_features = model.language_projection(
            query_output.view(pixel.shape[0] * model.config.num_query_tokens, -1)
        )
        embeds = model.get_input_embeddings()(torch.tensor(ids))
        embeds[torch.tensor(vim).bool()] = video_features
        lm = model.language_model
        embeds = embeds.repeat_interleave(nb, dim=0)
        attn = torch.tensor(mask).repeat_interleave(nb, dim=0)

        scorer = BeamSearchScorer(
            batch_size=b, num_beams=nb, device=torch.device("cpu"),
            length_penalty=length_penalty, do_early_stopping=False,
            num_beam_hyps_to_keep=num_return, num_beam_groups=G,
            max_length=max_new,
        )
        div_proc = (
            HammingDiversityLogitsProcessor(
                diversity_penalty=diversity, num_beams=nb, num_beam_groups=G
            )
            if diversity
            else None
        )
        eos_t = torch.tensor(list(eos_ids)) if eos_ids else None

        input_ids = torch.zeros(b * nb, 0, dtype=torch.long)
        beam_scores = torch.full((b, nb), -1e9, dtype=torch.float)
        beam_scores[:, ::ng] = 0.0
        beam_scores = beam_scores.view(-1)
        next_tokens = next_indices = None
        for _ in range(max_new):
            out = lm(
                inputs_embeds=embeds, attention_mask=attn,
                return_dict=True, use_cache=False,
            )
            logits = out.logits[:, -1].float()
            current_tokens = torch.zeros(b * nb, dtype=torch.long)
            reordering = torch.zeros(b * nb, dtype=torch.long)
            for g in range(G):
                gs = g * ng
                bgi = torch.tensor(
                    [bi * nb + gs + i for bi in range(b) for i in range(ng)]
                )
                group_input_ids = input_ids[bgi]
                scores = F.log_softmax(logits[bgi], dim=-1)
                vocab = scores.shape[-1]
                if div_proc is not None:
                    scores = div_proc(
                        group_input_ids, scores,
                        current_tokens=current_tokens, beam_group_idx=g,
                    )
                scores = scores + beam_scores[bgi].unsqueeze(-1)
                flat = scores.view(b, ng * vocab)
                top_scores, top_idx = torch.topk(
                    flat, 2 * ng, dim=1, largest=True, sorted=True
                )
                next_indices = torch.div(top_idx, vocab, rounding_mode="floor")
                next_tokens = top_idx % vocab
                bo = scorer.process(
                    group_input_ids, top_scores, next_tokens, next_indices,
                    pad_token_id=pad, eos_token_id=eos_t, group_index=g,
                    decoder_prompt_len=0,
                )
                beam_scores[bgi] = bo["next_beam_scores"]
                beam_idx = bo["next_beam_indices"].long()
                beam_tok = bo["next_beam_tokens"].long()
                input_ids[bgi] = group_input_ids[beam_idx]
                group_input_ids = torch.cat(
                    [group_input_ids[beam_idx], beam_tok.unsqueeze(-1)], dim=-1
                )
                current_tokens[bgi] = group_input_ids[:, -1]
                reordering[bgi] = (
                    nb * torch.div(beam_idx, ng, rounding_mode="floor")
                    + gs + (beam_idx % ng)
                )
            input_ids = torch.cat([input_ids, current_tokens.unsqueeze(-1)], dim=-1)
            embeds = embeds[reordering]
            attn = attn[reordering]
            embeds = torch.cat(
                [embeds, lm.get_input_embeddings()(current_tokens[:, None])], dim=1
            )
            attn = torch.cat([attn, torch.ones(b * nb, 1, dtype=attn.dtype)], dim=1)
            if scorer.is_done:
                break
        seq = scorer.finalize(
            input_ids, beam_scores, next_tokens, next_indices,
            max_length=max_new, pad_token_id=pad, eos_token_id=eos_t,
            decoder_prompt_len=0,
        )
        return seq["sequences"].cpu().numpy()


@pytest.mark.parametrize(
    "num_beams,num_groups,diversity,length_penalty",
    [(4, 2, 1.5, 1.0), (6, 3, 0.9, -1.0), (4, 4, 2.0, 1.0)],
)
def test_group_beam_token_identical(opt_setup, num_beams, num_groups, diversity,
                                    length_penalty):
    """Group (diverse) beam search: token-identical vs a torch oracle driving
    HF's still-in-tree BeamSearchScorer + HammingDiversityLogitsProcessor
    with the removed _group_beam_search control flow (see _torch_group_beam).
    Exercises decoding._beam_engine's group-sequential selection, the
    per-group hypothesis heaps, and the done-group pad-counting quirk."""
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    max_new = 8
    pad = cfg.text_config.pad_token_id
    eos = cfg.text_config.eos_token_id
    ref = _torch_group_beam(
        model, ids, mask, pixel, vim, max_new, num_beams, num_groups,
        diversity, length_penalty, (eos,), pad,
    )
    ours = np.asarray(
        generate(
            m,
            {"params": params},
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
            pixel_values=jnp.asarray(pixel),
            video_input_mask=jnp.asarray(vim),
            generation_config=GenerationConfig(
                max_new_tokens=max_new,
                num_beams=num_beams,
                num_beam_groups=num_groups,
                diversity_penalty=diversity,
                length_penalty=length_penalty,
                pad_token_id=pad,
                eos_token_id=(eos,),
            ),
        )
    )
    n = min(ref.shape[1], ours.shape[1])
    np.testing.assert_array_equal(ours[:, :n], ref[:, :n])


def test_group_beam_zero_diversity_equals_plain_subbeam(opt_setup):
    """With diversity_penalty=0 the groups never interact: every group runs
    the SAME ng-beam search, so group beam's best hypothesis equals plain
    ng-beam search's best. Self-consistency of the grouped engine."""
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    max_new = 6
    pad = cfg.text_config.pad_token_id
    kw = dict(
        input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
        pixel_values=jnp.asarray(pixel), video_input_mask=jnp.asarray(vim),
    )
    grouped = np.asarray(
        generate(
            m, {"params": params},
            generation_config=GenerationConfig(
                max_new_tokens=max_new, num_beams=4, num_beam_groups=2,
                pad_token_id=pad,
            ),
            **kw,
        )
    )
    plain = np.asarray(
        generate(
            m, {"params": params},
            generation_config=GenerationConfig(
                max_new_tokens=max_new, num_beams=2, pad_token_id=pad
            ),
            **kw,
        )
    )
    n = min(grouped.shape[1], plain.shape[1])
    np.testing.assert_array_equal(grouped[:, :n], plain[:, :n])


def test_group_beam_validation_and_t5(opt_setup):
    """HF's group-beam contract errors + the shared engine serves T5 too."""
    _, cfg, params, m, ids, mask, pixel, vim = opt_setup
    pad = cfg.text_config.pad_token_id
    with pytest.raises(ValueError, match="divisible"):
        generate(
            m, {"params": params}, input_ids=jnp.asarray(ids),
            generation_config=GenerationConfig(
                max_new_tokens=2, num_beams=5, num_beam_groups=2, pad_token_id=pad
            ),
        )
    with pytest.raises(ValueError, match="sampling"):
        generate(
            m, {"params": params}, input_ids=jnp.asarray(ids),
            generation_config=GenerationConfig(
                max_new_tokens=2, num_beams=4, num_beam_groups=2,
                do_sample=True, pad_token_id=pad,
            ),
        )
    with pytest.raises(ValueError, match="diversity_penalty"):
        generate(
            m, {"params": params}, input_ids=jnp.asarray(ids),
            generation_config=GenerationConfig(
                max_new_tokens=2, num_beams=4, diversity_penalty=1.0,
                pad_token_id=pad,
            ),
        )

    # T5: the seq2seq wrapper shares _beam_engine, so group beam works there
    # too — zero-diversity self-consistency vs plain sub-beam search
    from tests.models.hf_util import make_oracle

    t5_model, t5_cfg, t5_params = make_oracle("t5")
    t5 = VideoBlipForConditionalGeneration(t5_cfg)
    rng = np.random.default_rng(3)
    img = t5_cfg.vision_config.image_size
    q = t5_cfg.num_query_tokens
    t5_ids = rng.integers(4, t5_cfg.text_config.vocab_size, size=(2, 12))
    t5_vim = np.zeros((2, 12), np.int64)
    t5_vim[:, 1 : 1 + q] = 1
    t5_pixel = rng.normal(size=(2, 3, 2, img, img)).astype(np.float32)
    t5_kw = dict(
        input_ids=jnp.asarray(t5_ids),
        pixel_values=jnp.asarray(t5_pixel),
        video_input_mask=jnp.asarray(t5_vim),
    )
    grouped = np.asarray(
        generate(
            t5, {"params": t5_params},
            generation_config=GenerationConfig(
                max_new_tokens=5, num_beams=4, num_beam_groups=2,
                diversity_penalty=1.2, pad_token_id=t5_cfg.text_config.pad_token_id,
            ),
            **t5_kw,
        )
    )
    plain = np.asarray(
        generate(
            t5, {"params": t5_params},
            generation_config=GenerationConfig(
                max_new_tokens=5, num_beams=2,
                pad_token_id=t5_cfg.text_config.pad_token_id,
            ),
            **t5_kw,
        )
    )
    assert grouped.shape[0] == plain.shape[0]  # runs end to end under grouping


def test_sampling_runs_and_respects_vocab(opt_setup):
    _, cfg, params, m, ids, mask, pixel, vim = opt_setup
    out = np.asarray(
        generate(
            m,
            {"params": params},
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
            pixel_values=jnp.asarray(pixel),
            video_input_mask=jnp.asarray(vim),
            generation_config=GenerationConfig(
                max_new_tokens=6,
                do_sample=True,
                temperature=0.8,
                top_k=10,
                top_p=0.9,
                pad_token_id=cfg.text_config.pad_token_id,
            ),
            rng=jax.random.PRNGKey(3),
        )
    )
    assert out.shape == (2, 6)
    assert (out >= 0).all() and (out < cfg.text_config.vocab_size).all()


def test_beam_num_return_sequences_token_identical(opt_setup):
    """HF num_return_sequences with beam search: the top-n finished hypotheses
    per input, interleaved (row*n + rank) — reference CLI forwards it via the
    GenerationConfig JSON (generate_narration_texts.py:203)."""
    model, cfg, params, m, ids, mask, pixel, vim = opt_setup
    max_new = 8
    ref = _hf_generate(
        model,
        ids,
        mask,
        pixel,
        vim,
        max_new_tokens=max_new,
        do_sample=False,
        num_beams=3,
        num_return_sequences=2,
        pad_token_id=cfg.text_config.pad_token_id,
    )
    ours = np.asarray(
        generate(
            m,
            {"params": params},
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
            pixel_values=jnp.asarray(pixel),
            video_input_mask=jnp.asarray(vim),
            generation_config=GenerationConfig(
                max_new_tokens=max_new,
                num_beams=3,
                num_return_sequences=2,
                pad_token_id=cfg.text_config.pad_token_id,
            ),
        )
    )
    assert ours.shape[0] == ref.shape[0] == 2 * ids.shape[0]
    n = min(ref.shape[1], ours.shape[1])
    np.testing.assert_array_equal(ours[:, :n], ref[:, :n])


@pytest.mark.slow
def test_sampling_num_return_sequences_tile_exact(opt_setup):
    """The tile-after-one-prefill dedup must be bit-identical to physically
    repeating the inputs (HF's repeat_interleave layout) under the same rng."""
    _, cfg, params, m, ids, mask, pixel, vim = opt_setup
    nrs = 3
    b, v_per = ids.shape[0], pixel.shape[0] // ids.shape[0]
    gcfg = dict(
        max_new_tokens=6,
        do_sample=True,
        temperature=0.7,
        top_k=10,
        pad_token_id=cfg.text_config.pad_token_id,
    )
    key = jax.random.PRNGKey(11)
    tiled = np.asarray(
        generate(
            m,
            {"params": params},
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
            pixel_values=jnp.asarray(pixel),
            video_input_mask=jnp.asarray(vim),
            generation_config=GenerationConfig(num_return_sequences=nrs, **gcfg),
            rng=key,
        )
    )
    # physically repeat every input row nrs times (pixel rows are grouped
    # batch-major: repeat whole per-row video groups)
    pixel_rep = np.repeat(
        pixel.reshape(b, v_per, *pixel.shape[1:]), nrs, axis=0
    ).reshape(b * nrs * v_per, *pixel.shape[1:])
    manual = np.asarray(
        generate(
            m,
            {"params": params},
            input_ids=jnp.asarray(np.repeat(ids, nrs, axis=0)),
            attention_mask=jnp.asarray(np.repeat(mask, nrs, axis=0)),
            pixel_values=jnp.asarray(pixel_rep),
            video_input_mask=jnp.asarray(np.repeat(vim, nrs, axis=0)),
            generation_config=GenerationConfig(**gcfg),
            rng=key,
        )
    )
    assert tiled.shape == (b * nrs, 6)
    np.testing.assert_array_equal(tiled, manual)


def test_beam_sample_near_onehot_equals_beam():
    """Drive the shared beam engine with a synthetic near-one-hot score table:
    the Gumbel top-k draw (HF beam_sample's multinomial without replacement)
    picks the dominant candidates with probability ~1 (score gaps of 60 nats
    vs O(1) Gumbel noise), so sampled output must equal deterministic beam
    search token for token — validating the sampling machinery end to end
    without depending on HF's rng stream.

    (Note: a temperature->0 limit test would be WRONG here — HF beam_sample
    re-warps the cumulative beam score every step, so tiny temperatures
    compound on the beam score and change the search relative to plain beam
    search. This implementation reproduces that HF quirk.)"""
    from eilev_tpu.generation.decoding import _beam_engine

    b, nb, vocab, max_new = 1, 2, 16, 4
    seq = [3, 5, 7, 2]  # token per step; 2 == eos at the last step
    table = np.full((max_new + 1, vocab), -60.0, np.float32)
    for s, t in enumerate(seq):
        table[s, t] = 0.0
    table[max_new] = -60.0
    table_j = jnp.asarray(table)

    def step_fn(tokens, cache):
        i = cache["i"] + 1
        lp = jnp.broadcast_to(table_j[jnp.minimum(i, max_new)], (b * nb, vocab))
        return lp, {"i": i}

    def reorder_fn(cache, idx):
        return cache

    logprobs0 = jnp.broadcast_to(table_j[0], (b * nb, vocab))
    cache0 = {"i": jnp.zeros((), jnp.int32)}

    outs = {}
    for do_sample in (False, True):
        gcfg = GenerationConfig(
            max_new_tokens=max_new,
            num_beams=nb,
            do_sample=do_sample,
            temperature=1.0,
            top_k=0,
            top_p=1.0,
            eos_token_id=(2,),
            pad_token_id=0,
        )
        _, tokens = _beam_engine(
            logprobs0, cache0, step_fn, reorder_fn, gcfg, b,
            rng=jax.random.PRNGKey(23),
        )
        outs[do_sample] = np.asarray(tokens[:, 0])
    np.testing.assert_array_equal(outs[True], outs[False])
    # and the dominant path is actually what the table encodes
    np.testing.assert_array_equal(outs[False][0], np.asarray(seq, np.int32))


def test_beam_sample_stochastic_and_bounded(opt_setup):
    _, cfg, params, m, ids, mask, pixel, vim = opt_setup
    common = dict(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
        pixel_values=jnp.asarray(pixel),
        video_input_mask=jnp.asarray(vim),
    )
    gcfg = GenerationConfig(
        max_new_tokens=6,
        num_beams=3,
        do_sample=True,
        temperature=5.0,
        num_return_sequences=2,
        pad_token_id=cfg.text_config.pad_token_id,
    )
    outs = [
        np.asarray(
            generate(m, {"params": params}, generation_config=gcfg,
                     rng=jax.random.PRNGKey(seed), **common)
        )
        for seed in (0, 1)
    ]
    for out in outs:
        assert out.shape[0] == 2 * ids.shape[0]
        assert (out >= 0).all() and (out < cfg.text_config.vocab_size).all()
    # at temperature 5 over a near-uniform random-weight vocab, two seeds
    # agreeing everywhere would be astronomically unlikely
    a, b = outs
    n = min(a.shape[1], b.shape[1])
    assert not np.array_equal(a[:, :n], b[:, :n])


def test_num_return_sequences_validation(opt_setup):
    _, cfg, params, m, ids, mask, pixel, vim = opt_setup
    common = dict(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
        pixel_values=jnp.asarray(pixel),
        video_input_mask=jnp.asarray(vim),
    )
    with pytest.raises(ValueError, match="greedy"):
        generate(
            m,
            {"params": params},
            generation_config=GenerationConfig(num_return_sequences=2),
            **common,
        )
    with pytest.raises(ValueError, match="smaller or equal to num_beams"):
        generate(
            m,
            {"params": params},
            generation_config=GenerationConfig(num_beams=2, num_return_sequences=3),
            **common,
        )


@pytest.mark.slow
def test_t5_greedy_token_identical():
    model, cfg, params = make_oracle("t5")
    rng = np.random.default_rng(9)
    b, t, s = 2, 2, 12
    img = cfg.vision_config.image_size
    pixel = rng.normal(size=(b, 3, t, img, img)).astype(np.float32)
    ids = rng.integers(4, cfg.text_config.vocab_size, size=(b, s))
    mask = np.ones((b, s), np.int64)
    vim = np.zeros((b, s), np.int64)
    vim[:, : cfg.num_query_tokens] = 1

    ref = _hf_generate(model, ids, mask, pixel, vim, max_new_tokens=6, do_sample=False)
    m = VideoBlipForConditionalGeneration(cfg)
    ours = np.asarray(
        generate(
            m,
            {"params": params},
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
            pixel_values=jnp.asarray(pixel),
            video_input_mask=jnp.asarray(vim),
            generation_config=GenerationConfig(
                max_new_tokens=6,
                pad_token_id=cfg.text_config.pad_token_id,
                eos_token_id=(cfg.text_config.eos_token_id,),
            ),
        )
    )
    n = min(ref.shape[1], ours.shape[1])
    np.testing.assert_array_equal(ours[:, :n], ref[:, :n])


@pytest.mark.slow
def test_t5_sampling_num_return_sequences():
    """Seq2seq sampling with num_return_sequences: encode + cross-KV once,
    tiled across copies; rows interleaved like HF."""
    _, cfg, params = make_oracle("t5")
    rng = np.random.default_rng(13)
    b, t, s, nrs = 2, 2, 12, 3
    img = cfg.vision_config.image_size
    pixel = rng.normal(size=(b, 3, t, img, img)).astype(np.float32)
    ids = rng.integers(4, cfg.text_config.vocab_size, size=(b, s))
    mask = np.ones((b, s), np.int64)
    vim = np.zeros((b, s), np.int64)
    vim[:, : cfg.num_query_tokens] = 1
    m = VideoBlipForConditionalGeneration(cfg)
    out = np.asarray(
        generate(
            m,
            {"params": params},
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
            pixel_values=jnp.asarray(pixel),
            video_input_mask=jnp.asarray(vim),
            generation_config=GenerationConfig(
                max_new_tokens=6,
                do_sample=True,
                temperature=0.8,
                num_return_sequences=nrs,
                pad_token_id=cfg.text_config.pad_token_id,
                eos_token_id=(cfg.text_config.eos_token_id,),
            ),
            rng=jax.random.PRNGKey(5),
        )
    )
    # decoder start token + up to max_new generated
    assert out.shape == (b * nrs, 7)
    assert (out[:, 0] == cfg.text_config.decoder_start_token_id).all()
    assert (out >= 0).all() and (out < cfg.text_config.vocab_size).all()


@pytest.mark.slow
def test_classify_matches_full_forward(opt_setup):
    """classify == mean log-likelihood computed from a full prompt+class forward.

    This is a stronger check than comparing against the reference's classify
    (whose repeat_interleave cache path no longer runs on current transformers):
    the full forward IS parity-tested against HF, so agreement here proves the
    shared-prefix cache path end to end. Also covers class_batch_size equivalence
    (reference tests/model/test_model_v2.py:335-375).
    """
    _, cfg, params, m, ids, mask, pixel, vim = opt_setup
    rng = np.random.default_rng(11)
    c, l = 5, 3
    class_ids = rng.integers(4, cfg.text_config.vocab_size, size=(c, l))
    class_mask = np.ones((c, l), np.int64)
    class_mask[1, 2] = 0  # one shorter class
    class_ids[1, 2] = cfg.text_config.pad_token_id

    ll = np.asarray(
        classify(
            m,
            {"params": params},
            prompt_input_ids=jnp.asarray(ids),
            class_input_ids=jnp.asarray(class_ids),
            prompt_attention_mask=jnp.asarray(mask),
            pixel_values=jnp.asarray(pixel),
            prompt_video_input_mask=jnp.asarray(vim),
            class_attention_mask=jnp.asarray(class_mask),
        )
    )
    assert ll.shape == (2, c)

    # chunked == unchunked (reference test_classify class_batch_size allclose)
    ll_chunked = np.asarray(
        classify(
            m,
            {"params": params},
            prompt_input_ids=jnp.asarray(ids),
            class_input_ids=jnp.asarray(class_ids),
            prompt_attention_mask=jnp.asarray(mask),
            pixel_values=jnp.asarray(pixel),
            prompt_video_input_mask=jnp.asarray(vim),
            class_attention_mask=jnp.asarray(class_mask),
            class_batch_size=2,
        )
    )
    np.testing.assert_allclose(ll, ll_chunked, atol=1e-5, rtol=1e-5)

    # ground truth via the (HF-parity-tested) full forward, one class at a time
    b, s = ids.shape
    for ci in range(c):
        clen = int(class_mask[ci].sum())
        full_ids = np.concatenate([ids, np.tile(class_ids[ci][None], (b, 1))], axis=1)
        full_mask = np.concatenate([mask, np.tile(class_mask[ci][None], (b, 1))], axis=1)
        full_vim = np.concatenate([vim, np.zeros((b, l), np.int64)], axis=1)
        out = m.apply(
            {"params": params},
            input_ids=jnp.asarray(full_ids),
            attention_mask=jnp.asarray(full_mask),
            pixel_values=jnp.asarray(pixel),
            video_input_mask=jnp.asarray(full_vim),
        )
        logits = np.asarray(out["logits"]).astype(np.float64)
        logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
        for bi in range(b):
            total = 0.0
            for ti in range(clen):
                pos = s + ti  # token at pos predicted by logits at pos-1
                total += logp[bi, pos - 1, class_ids[ci, ti]]
            expected = total / clen
            np.testing.assert_allclose(ll[bi, ci], expected, atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_t5_beam_token_identical():
    model, cfg, params = make_oracle("t5")
    rng = np.random.default_rng(13)
    b, t, s = 2, 2, 10
    img = cfg.vision_config.image_size
    pixel = rng.normal(size=(b, 3, t, img, img)).astype(np.float32)
    ids = rng.integers(4, cfg.text_config.vocab_size, size=(b, s))
    mask = np.ones((b, s), np.int64)
    vim = np.zeros((b, s), np.int64)
    vim[:, : cfg.num_query_tokens] = 1

    ref = _hf_generate(
        model, ids, mask, pixel, vim, max_new_tokens=6, do_sample=False, num_beams=3,
    )
    m = VideoBlipForConditionalGeneration(cfg)
    ours = np.asarray(
        generate(
            m,
            {"params": params},
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
            pixel_values=jnp.asarray(pixel),
            video_input_mask=jnp.asarray(vim),
            generation_config=GenerationConfig(
                max_new_tokens=6,
                num_beams=3,
                pad_token_id=cfg.text_config.pad_token_id,
                eos_token_id=(cfg.text_config.eos_token_id,),
            ),
        )
    )
    n = min(ref.shape[1], ours.shape[1])
    np.testing.assert_array_equal(ours[:, :n], ref[:, :n])


@pytest.mark.slow
def test_classify_seq2seq_matches_full_forward():
    """Seq2seq classify (additive: the reference asserts decoder-only,
    v2.py:351): shared-encoder class scoring == the HF-parity-tested full
    forward run one class at a time."""
    model, cfg, params = make_oracle("t5")
    rng = np.random.default_rng(13)
    b, t, s = 2, 2, 12
    img = cfg.vision_config.image_size
    pixel = rng.normal(size=(b, 3, t, img, img)).astype(np.float32)
    ids = rng.integers(4, cfg.text_config.vocab_size, size=(b, s))
    mask = np.ones((b, s), np.int64)
    mask[0, :2] = 0  # encoder-side padding
    vim = np.zeros((b, s), np.int64)
    vim[:, 2 : 2 + cfg.num_query_tokens] = 1

    c, l = 4, 3
    class_ids = rng.integers(4, cfg.text_config.vocab_size, size=(c, l))
    class_mask = np.ones((c, l), np.int64)
    class_mask[2, 2] = 0
    class_ids[2, 2] = cfg.text_config.pad_token_id

    m = VideoBlipForConditionalGeneration(cfg)
    ll = np.asarray(
        classify(
            m,
            {"params": params},
            prompt_input_ids=jnp.asarray(ids),
            class_input_ids=jnp.asarray(class_ids),
            prompt_attention_mask=jnp.asarray(mask),
            pixel_values=jnp.asarray(pixel),
            prompt_video_input_mask=jnp.asarray(vim),
            class_attention_mask=jnp.asarray(class_mask),
        )
    )
    assert ll.shape == (b, c)

    ll_chunked = np.asarray(
        classify(
            m,
            {"params": params},
            prompt_input_ids=jnp.asarray(ids),
            class_input_ids=jnp.asarray(class_ids),
            prompt_attention_mask=jnp.asarray(mask),
            pixel_values=jnp.asarray(pixel),
            prompt_video_input_mask=jnp.asarray(vim),
            class_attention_mask=jnp.asarray(class_mask),
            class_batch_size=3,
        )
    )
    np.testing.assert_allclose(ll, ll_chunked, atol=1e-5, rtol=1e-5)

    for ci in range(c):
        clen = int(class_mask[ci].sum())
        labels = np.tile(class_ids[ci][None], (b, 1))
        out = m.apply(
            {"params": params},
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
            pixel_values=jnp.asarray(pixel),
            video_input_mask=jnp.asarray(vim),
            labels=jnp.asarray(labels),
            decoder_attention_mask=jnp.asarray(np.tile(class_mask[ci][None], (b, 1))),
        )
        logits = np.asarray(out["logits"]).astype(np.float64)
        logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
        for bi in range(b):
            total = sum(logp[bi, ti, class_ids[ci, ti]] for ti in range(clen))
            np.testing.assert_allclose(ll[bi, ci], total / clen, atol=2e-4, rtol=2e-4)
