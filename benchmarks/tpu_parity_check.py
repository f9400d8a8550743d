"""On-TPU compiled-kernel token-parity check: fused Pallas attention vs XLA.

The CPU test suite can only exercise the Pallas kernels in interpret mode
(tests/models/test_fused_attention.py); this script enforces the bf16
greedy-token-parity claim on the COMPILED kernels on a real chip — run it as
part of the verify harness whenever the attention kernels or the generation
path change. Exits non-zero on any token mismatch.

Covers the claim from ops/fused_attention.py: the kernels round QK^T scores
to the model dtype before the fp32 softmax, matching the XLA/HF bf16
numerics exactly (ADVICE r2: the parity claim must be enforced against the
compiled path, not only interpret mode).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from eilev_tpu import configs
from eilev_tpu.generation import GenerationConfig, generate
from eilev_tpu.models import VideoBlipForConditionalGeneration
from eilev_tpu.ops.attention import set_default_attention_impl


def main() -> int:
    print("devices:", jax.devices())
    if jax.default_backend() not in ("tpu", "axon"):
        print("WARNING: not on TPU - this checks the interpret-mode kernels only")

    cfg = configs.tiny_config(
        text_model="opt", hidden=128, heads=4, layers=3, image_size=32,
        patch_size=16, vocab_size=512, num_query_tokens=8,
    )
    model = VideoBlipForConditionalGeneration(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    b, s = 4, 48
    img = cfg.vision_config.image_size
    pixel = jnp.asarray(rng.normal(size=(b, 3, 4, img, img)).astype(np.float32))
    ids = jnp.asarray(rng.integers(4, cfg.text_config.vocab_size, size=(b, s)))
    vim = np.zeros((b, s), np.int32)
    vim[:, 1 : 1 + cfg.num_query_tokens] = 1
    vim = jnp.asarray(vim)
    mask = jnp.ones((b, s), jnp.int32)
    params = jax.jit(
        lambda k: model.init(
            k, input_ids=ids, pixel_values=pixel, video_input_mask=vim
        )["params"]
    )(jax.random.PRNGKey(0))
    variables = {"params": params}
    gen_cfg = GenerationConfig(max_new_tokens=16, pad_token_id=1)

    outs = {}
    for impl in ("xla", "fused"):
        set_default_attention_impl(impl)
        outs[impl] = np.asarray(
            generate(
                model, variables, input_ids=ids, attention_mask=mask,
                pixel_values=pixel, video_input_mask=vim, generation_config=gen_cfg,
            )
        )
    set_default_attention_impl("auto")

    if (outs["xla"] == outs["fused"]).all():
        print("OK: fused == xla, token-identical bf16 greedy "
              f"({outs['xla'].shape[0]}x{outs['xla'].shape[1]} tokens)")
        return 0
    diff = int((outs["xla"] != outs["fused"]).sum())
    print(f"FAIL: {diff} token mismatches\nxla:   {outs['xla'][:2]}\n"
          f"fused: {outs['fused'][:2]}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
