"""IclEvaluator vision-feature caching: predictions with ``vision_cache`` set
must be identical to the uncached two-stage eval (the cache only moves the
vision tower out of the classify calls), and the noun stage must be all hits
(the reference encodes the same videos twice per datapoint —
icl_eval.py:239-313).
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eilev_tpu import configs
from eilev_tpu.eval import IclEvaluator
from eilev_tpu.models import VideoBlipForConditionalGeneration


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    from tests.util_tokenizer import build_tiny_tokenizer

    tok_dir = tmp_path_factory.mktemp("icl_tok")
    tokenizer = build_tiny_tokenizer(str(tok_dir), vocab_size=384)

    cfg = configs.tiny_config(text_model="opt", vocab_size=384)
    model = VideoBlipForConditionalGeneration(cfg, dtype=jnp.float32)
    img = cfg.vision_config.image_size
    rng = np.random.default_rng(0)

    verbs = ["take", "cut"]
    nouns = ["knife", "onion"]

    def make_dp(i):
        return {
            "frame_path": f"vid{i}|0",
            "narration_text": f"#C C does {verbs[i % 2]} {nouns[i // 2 % 2]}",
            "structured_verb": verbs[i % 2],
            "structured_noun": nouns[i // 2 % 2],
            "video": rng.integers(0, 255, (3, 2, img, img)).astype(np.uint8),
        }

    train = [make_dp(i) for i in range(4)]
    eval_ds = [make_dp(10 + i) for i in range(3)]

    ids = jnp.asarray([[2] + [1] * cfg.num_query_tokens + [4, 5]])
    vim = jnp.zeros_like(ids).at[:, 1 : 1 + cfg.num_query_tokens].set(1)
    pixel = jnp.asarray(rng.normal(size=(1, 3, 2, img, img)), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), input_ids=ids, pixel_values=pixel, video_input_mask=vim
    )["params"]

    kw = dict(
        verb_prompts={"takes": "take", "cuts": "cut"},
        noun_prompts={"a knife": "knife", "an onion": "onion"},
        verbs=verbs,
        nouns=nouns,
        num_shot=1,
        dtype=jnp.float32,
    )
    return model, {"params": params}, tokenizer, train, eval_ds, kw


@pytest.mark.slow
def test_vision_cache_predictions_identical(world):
    model, variables, tokenizer, train, eval_ds, kw = world

    base = IclEvaluator(
        model, variables, tokenizer, rng=random.Random(7), **kw
    ).evaluate(eval_ds, train, batch_size=2)

    ev = IclEvaluator(
        model, variables, tokenizer, rng=random.Random(7), vision_cache=64, **kw
    )
    cached = ev.evaluate(eval_ds, train, batch_size=2)

    assert cached.verb_predictions == base.verb_predictions
    assert cached.noun_predictions == base.noun_predictions
    assert cached.verb_f1 == base.verb_f1 and cached.noun_f1 == base.noun_f1
    # every video of the noun stage was already encoded by the verb stage
    assert ev._feature_cache is not None
    assert ev._feature_cache.hits >= ev._feature_cache.misses
    assert ev._feature_cache.misses <= len(train) + len(eval_ds)


@pytest.mark.slow
def test_lazy_frame_loader_predictions_identical(world):
    """Metadata-only datasets + frame_loader: identical predictions, and the
    loader runs once per distinct video (cache hits skip host frame IO)."""
    model, variables, tokenizer, train, eval_ds, kw = world

    base = IclEvaluator(
        model, variables, tokenizer, rng=random.Random(7), **kw
    ).evaluate(eval_ds, train, batch_size=2)

    frames = {dp["frame_path"]: dp["video"] for dp in train + eval_ds}
    loads: list[str] = []

    def loader(key):
        loads.append(key)
        return frames[key]

    meta_train = [{k: v for k, v in dp.items() if k != "video"} for dp in train]
    meta_eval = [{k: v for k, v in dp.items() if k != "video"} for dp in eval_ds]
    ev = IclEvaluator(
        model, variables, tokenizer, rng=random.Random(7),
        vision_cache=64, frame_loader=loader, **kw,
    )
    lazy = ev.evaluate(meta_eval, meta_train, batch_size=2)

    assert lazy.verb_predictions == base.verb_predictions
    assert lazy.noun_predictions == base.noun_predictions
    assert lazy.verb_f1 == base.verb_f1 and lazy.noun_f1 == base.noun_f1
    # one load per distinct video ever touched, regardless of how many
    # classify calls referenced it
    assert len(loads) == len(set(loads))
    assert ev._feature_cache is not None and ev._feature_cache.misses == len(loads)


def test_frame_loader_requires_cache(world):
    model, variables, tokenizer, train, eval_ds, kw = world
    with pytest.raises(ValueError, match="frame_loader requires vision_cache"):
        IclEvaluator(
            model, variables, tokenizer, frame_loader=lambda k: None, **kw
        )


def test_vendored_class_prompt_maps():
    """The repo vendors the reference's eval-data prompt->class CSVs
    (reference scripts/ego4d/eval-data, consumed at its icl_eval.py:406-420):
    188 verb prompts and 793 noun prompts, loadable via load_prompt_map."""
    import os

    from eilev_tpu.eval import load_prompt_map

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    d = os.path.join(repo, "scripts", "ego4d", "eval-data")
    verbs = load_prompt_map(os.path.join(d, "structured_verb_prompt.csv"), "structured_verb")
    nouns = load_prompt_map(os.path.join(d, "structured_noun_prompt.csv"), "structured_noun")
    assert len(verbs) == 187  # 188 rows incl. header
    # 793 rows incl. header; 4 duplicate prompt keys collapse in the dict,
    # exactly as in the reference's dict-building loop (icl_eval.py:414-419)
    assert len(nouns) == 788
    # two-stage prompt surface: verb prompts are conjugated verbs, noun
    # prompts are determiner phrases
    assert verbs["adjusts"].startswith("adjust")
    assert nouns["an apple"] == "apple"
    # class sets (the fho-lta taxonomy side of the reference's assertion)
    assert len(set(verbs.values())) > 50
    assert len(set(nouns.values())) > 300
