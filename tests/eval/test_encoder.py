"""Torch-free metric encoders vs tiny random HF oracles: MPNet (the STS
bi-encoder family), BERT, RoBERTa, and the RoBERTa cross-encoder head
(reference metric models: all-mpnet-base-v2, roberta-large BERTScore,
stsb-roberta-large — generation_eval.py:14-72)."""

import numpy as np
import pytest
import torch

from eilev_tpu.eval.encoder import (
    EncoderConfig,
    TextEncoder,
    bertscore_native,
    convert_encoder,
    encoder_config_from_hf,
)

GEOM = dict(
    vocab_size=120,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=64,
)


def _ids(cfg, b=2, s=10, seed=0, pad_rows=True):
    rng = np.random.default_rng(seed)
    ids = rng.integers(5, cfg.vocab_size, size=(b, s))
    mask = np.ones((b, s), np.int64)
    if pad_rows:
        mask[1, -3:] = 0
        ids[1, -3:] = cfg.pad_token_id
    return ids, mask


def _jax_hidden(cfg, params, ids, mask):
    import jax.numpy as jnp

    model = TextEncoder(cfg)
    return np.asarray(
        model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    )


@pytest.mark.slow
def test_bert_parity():
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(**GEOM, hidden_act="gelu", pad_token_id=0)
    torch.manual_seed(0)
    hf = BertModel(hf_cfg).eval()
    cfg = encoder_config_from_hf(hf_cfg.to_dict())
    params = convert_encoder(hf.state_dict(), cfg)
    ids, mask = _ids(cfg)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    ours = _jax_hidden(cfg, params, ids, mask)[-1]
    real = mask.astype(bool)
    np.testing.assert_allclose(ours[real], ref[real], rtol=2e-4, atol=2e-5)


def test_roberta_parity():
    from transformers import RobertaConfig, RobertaModel

    hf_cfg = RobertaConfig(**GEOM, pad_token_id=1)
    torch.manual_seed(1)
    hf = RobertaModel(hf_cfg).eval()
    cfg = encoder_config_from_hf(hf_cfg.to_dict())
    params = convert_encoder(hf.state_dict(), cfg)
    ids, mask = _ids(cfg, seed=1)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    ours = _jax_hidden(cfg, params, ids, mask)[-1]
    real = mask.astype(bool)
    np.testing.assert_allclose(ours[real], ref[real], rtol=2e-4, atol=2e-5)


def test_mpnet_parity():
    from transformers import MPNetConfig, MPNetModel

    hf_cfg = MPNetConfig(**GEOM, pad_token_id=1)
    torch.manual_seed(2)
    hf = MPNetModel(hf_cfg).eval()
    cfg = encoder_config_from_hf(hf_cfg.to_dict())
    params = convert_encoder(hf.state_dict(), cfg)
    ids, mask = _ids(cfg, seed=2)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    ours = _jax_hidden(cfg, params, ids, mask)[-1]
    real = mask.astype(bool)
    np.testing.assert_allclose(ours[real], ref[real], rtol=2e-4, atol=2e-5)


def test_cross_encoder_head_parity():
    """sentence-transformers CrossEncoder semantics: RobertaForSequenceClassification
    logits -> sigmoid (num_labels == 1)."""
    import jax.numpy as jnp
    from transformers import RobertaConfig, RobertaForSequenceClassification

    hf_cfg = RobertaConfig(**GEOM, pad_token_id=1, num_labels=1)
    torch.manual_seed(3)
    hf = RobertaForSequenceClassification(hf_cfg).eval()
    cfg = encoder_config_from_hf(hf_cfg.to_dict(), num_labels=1)
    params = convert_encoder(hf.state_dict(), cfg)
    ids, mask = _ids(cfg, seed=3)
    with torch.no_grad():
        ref = torch.sigmoid(
            hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)).logits[:, 0]
        ).numpy()
    from eilev_tpu.eval.encoder import CrossEncoderModel

    model = CrossEncoderModel(cfg)
    ours = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


@pytest.fixture(scope="module")
def sentence_encoder(tmp_path_factory):
    import sys

    sys.path.insert(0, "tests")
    from transformers import MPNetConfig, MPNetModel

    from tests.util_tokenizer import build_tiny_tokenizer

    from eilev_tpu.eval.encoder import SentenceEncoder

    d = str(tmp_path_factory.mktemp("mpnet"))
    hf_cfg = MPNetConfig(vocab_size=384, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=4, intermediate_size=64,
                         max_position_embeddings=128, pad_token_id=1)
    torch.manual_seed(4)
    hf = MPNetModel(hf_cfg).eval()
    hf.save_pretrained(d, safe_serialization=True)
    build_tiny_tokenizer(d, vocab_size=384)
    return SentenceEncoder(d), hf


def test_sentence_encoder_mean_pool_cosine(sentence_encoder):
    enc, hf = sentence_encoder
    texts_a = ["The camera wearer cuts an onion.", "A person takes a knife."]
    texts_b = ["The camera wearer cuts an onion.", "Something unrelated entirely."]
    a = enc.encode(texts_a)
    b = enc.encode(texts_b)
    np.testing.assert_allclose(np.linalg.norm(a, axis=-1), 1.0, rtol=1e-5)
    cos = np.sum(a * b, axis=-1)
    assert cos[0] > 0.999  # identical sentences
    # parity of the pooled embedding vs torch mean pooling on the same ids
    ids, mask = enc._tokenize(texts_a)
    with torch.no_grad():
        last = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)).last_hidden_state
        m = torch.tensor(mask)[:, :, None].float()
        ref = (last * m).sum(1) / m.sum(1)
        ref = torch.nn.functional.normalize(ref, dim=-1).numpy()
    np.testing.assert_allclose(a, ref, rtol=2e-4, atol=2e-5)


def test_bertscore_native_properties(sentence_encoder):
    enc, _ = sentence_encoder
    preds = ["the camera wearer cuts an onion", "a person opens the drawer"]
    refs = ["the camera wearer cuts an onion", "completely different words here"]
    f1 = bertscore_native(preds, refs, enc)
    assert f1.shape == (2,)
    np.testing.assert_allclose(f1[0], 1.0, atol=1e-4)  # identical pair
    assert f1[1] < f1[0]
    # rescaling maps baseline to 0
    rescaled = bertscore_native(preds, refs, enc, baseline=0.5)
    np.testing.assert_allclose(rescaled, (f1 - 0.5) / 0.5, rtol=1e-6)
