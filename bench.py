"""Headline benchmark: 16-shot Ego4D ICL narration generation throughput.

Mirrors the reference's flagship eval workload (BASELINE.md north star):
eilev-blip2-opt-2.7b geometry, 17 videos (16 in-context shots + 1 query) x
8 frames x 224^2, interleaved prompt (~17*(32+1) video tokens + instruction/
narration text), greedy decode of 32 new tokens - the exact shape of one
datapoint of scripts/general/generate_narration_texts.py in the reference
(slurm-scripts/README.md:71-76: 4xA40, batch 1/GPU, 24 h budget).

Weights are random (no Hub access in this environment) at the real geometry -
identical compute cost to the published checkpoint. Runs in bfloat16 on one
TPU chip; fused preprocess + vision + prefill + 32-token decode measured end
to end from device-resident uint8 frames. The host->device frame transfer is
measured and reported separately (h2d_* fields): this dev environment reaches
the TPU via a ~20-35 MB/s tunnel that cannot overlap transfers with compute
(production PCIe moves the 82 MB batch in ~8 ms, fully prefetch-overlapped),
so folding it into the headline would benchmark the tunnel, not the design.

``vs_baseline``: the reference publishes no machine-readable throughput
(SURVEY.md section 6). We use an estimated 8xA40 reference throughput of
27.6 videos/s TOTAL (8 x 150 TFLOP/s fp16 peak x 10% MFU - generous for
batch-1 HF eager decoding - over the ~74 TFLOPs/datapoint this workload costs),
i.e. 3.45 videos/s per accelerator, and report
    vs_baseline = measured_videos_per_sec_on_one_chip / 3.45
so >1.0 means one v5e chip beats one A40 on the reference's own workload.
"""

from __future__ import annotations

import json
import os
import time

# Persistent XLA compilation cache (utils/compile_cache.py): the flagship
# programs cost minutes of remote compile over this tunnel; caching them in
# the repo (gitignored) makes repeated bench runs pay execution only.
os.environ.setdefault(
    "EILEV_COMPILATION_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "xla"),
)

import jax
import jax.numpy as jnp
import numpy as np

from eilev_tpu import configs
from eilev_tpu.utils.compile_cache import maybe_enable_compilation_cache

maybe_enable_compilation_cache()
from eilev_tpu.generation import GenerationConfig
from eilev_tpu.generation.decoding import _greedy_sample_decoder_only
from eilev_tpu.models import VideoBlipForConditionalGeneration
from eilev_tpu.models.video_blip import VideoBlipForConditionalGeneration as VB

SHOTS = 16
FRAMES = 8
MAX_NEW_TOKENS = 32
TEXT_TOKENS_PER_SHOT = 12  # instruction/narration text per shot, ~EILeV prompts
REPS = 3
EST_REFERENCE_VIDEOS_PER_SEC_PER_ACCEL = 3.45


def build_prompt(cfg, batch=1):
    """Interleaved 16-shot prompt layout per the data contract
    (eilev_tpu/data/prompts.py): bos + per-video [32 pads + newline] + text."""
    v = SHOTS + 1
    q = cfg.num_query_tokens
    rng = np.random.default_rng(0)
    ids, vim = [2], [0]  # bos
    for _ in range(v):
        ids += [1] * q + [50118]
        vim += [1] * q + [0]
        toks = rng.integers(1000, 40000, size=TEXT_TOKENS_PER_SHOT).tolist()
        ids += toks
        vim += [0] * len(toks)
    ids = np.asarray([ids] * batch)
    vim = np.asarray([vim] * batch)
    mask = np.ones_like(ids)
    return ids, mask, vim


def random_bf16_params(model, example):
    """Init at full geometry directly in bf16 on device: eval_shape for the tree,
    then one jitted program filling every leaf (no fp32 15 GB intermediate)."""
    shapes = jax.eval_shape(
        lambda k, i, p, m: model.init(k, input_ids=i, pixel_values=p, video_input_mask=m),
        jax.random.PRNGKey(0),
        example["input_ids"],
        example["pixel_values"],
        example["video_input_mask"],
    )["params"]
    leaves, treedef = jax.tree.flatten(shapes)

    @jax.jit
    def make(key):
        keys = jax.random.split(key, len(leaves))
        out = []
        for k, leaf in zip(keys, leaves):
            out.append((jax.random.normal(k, leaf.shape, jnp.bfloat16) * 0.02))
        return jax.tree.unflatten(treedef, out)

    return make(jax.random.PRNGKey(42))


def _train_leg() -> dict | None:
    """Flagship TRAINING step (the reference's 36 h / 8xA40 recipe cost,
    BASELINE.md row 1), measured live in a SUBPROCESS so it runs before this
    process claims the chip and releases all HBM afterwards. The default
    variant is the measured-best (micro 1 — datapoint throughput is FLAT in
    micro-batch on this chip, docs/PERF.md "Training"). Opt out: BENCH_TRAIN=0."""
    import subprocess
    import sys

    env = dict(
        os.environ,
        TRAIN_BENCH_VARIANTS=os.environ.get("BENCH_TRAIN_VARIANT", "1"),
        TRAIN_BENCH_STEPS=os.environ.get("BENCH_TRAIN_STEPS", "3"),
    )
    script = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks", "train_step_bench.py"
    )
    try:
        proc = subprocess.run(
            [sys.executable, script],
            env=env, capture_output=True, text=True, timeout=3000,
        )
    except Exception:
        return None
    rec = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "videos_per_sec" in parsed:
                rec = parsed
    return rec


def main() -> None:
    train = None
    if os.environ.get("BENCH_TRAIN", "1") == "1":
        train = _train_leg()

    cfg = configs.blip2_opt_2_7b()
    model = VideoBlipForConditionalGeneration(cfg, dtype=jnp.bfloat16)

    batch = int(os.environ.get("BENCH_BATCH", "4"))  # 23.4 v/s at 4 vs 12.9 at 1
    v = batch * (SHOTS + 1)
    ids, mask, vim = build_prompt(cfg, batch)
    # raw uint8 frames ship to the device (4x less H2D traffic than fp32);
    # subsample/rescale/normalize fuse into the on-device program, like the
    # production pipeline (ops.preprocess.process_videos)
    pixel_host = np.random.default_rng(1).integers(
        0, 256, size=(v, 3, FRAMES, 224, 224), dtype=np.uint8
    )

    example = {
        "input_ids": jax.ShapeDtypeStruct(ids.shape, jnp.int32),
        "pixel_values": jax.ShapeDtypeStruct(
            (v, 3, FRAMES, 224, 224), jnp.bfloat16
        ),
        "video_input_mask": jax.ShapeDtypeStruct(vim.shape, jnp.int32),
    }
    params = random_bf16_params(model, example)
    variables = {"params": params}

    gen_cfg = GenerationConfig(
        max_new_tokens=MAX_NEW_TOKENS, pad_token_id=1, eos_token_id=(50118,)
    )

    ids_d = jnp.asarray(ids, jnp.int32)
    mask_d = jnp.asarray(mask, jnp.int32)
    vim_d = jnp.asarray(vim, jnp.int32)
    rng = jax.random.PRNGKey(0)

    from eilev_tpu.ops.preprocess import process_videos

    if os.environ.get("BENCH_FAST_GELU", "0") == "1":
        # opt-in serving mode: tanh gelu in the ViT (98.9% bf16-faithful,
        # tower 66 -> 74% MFU; ops/gelu.py)
        from eilev_tpu.ops.gelu import set_gelu_impl

        set_gelu_impl("fast")

    # >1: run the ViT in sequential chunks (lax.map) to cap the activation
    # peak — required for batch >= 8, where the monolithic vision stage
    # oversubscribes HBM and XLA spills (measured 25.7 -> 6.1 videos/s)
    vision_chunks = int(os.environ.get("BENCH_VISION_CHUNKS", "1"))

    from eilev_tpu.models.video_blip import embed_and_scatter_chunked

    @jax.jit
    def full_step(variables, pixel_u8):
        # ONE compiled program: fused preprocess -> vision -> qformer -> scatter
        # -> prefill -> 32-step decode. No host round-trips between stages.
        pixel = process_videos(pixel_u8, dtype=jnp.bfloat16)
        embeds = embed_and_scatter_chunked(
            model, variables, ids_d, pixel, vim_d, vision_chunks=vision_chunks
        )
        return _greedy_sample_decoder_only(model, variables, embeds, mask_d, gen_cfg, rng)

    # Input batches are staged on device BEFORE the timed loop, and the H2D
    # transfer is measured separately below. Rationale (honesty, not flattery):
    # a production input pipeline prefetches frames over PCIe (~10 GB/s; the
    # 82 MB uint8 batch = ~8 ms, fully overlapped with the 2.7 s device step).
    # This dev environment reaches the TPU through a tunnel that moves
    # ~20-35 MB/s WITH HIGH VARIANCE and - measured - cannot overlap transfers
    # with device compute without degrading both (threaded put+step: 6.3 s vs
    # 4.8 s issued serially). Timing the tunnel would benchmark the tunnel.
    # The h2d_* fields below report what it costs here anyway.
    def one_step(pixel_dev):
        # The returned np.asarray forces a device->host readback of the tokens:
        # on the axon platform block_until_ready does NOT wait for completion,
        # so the readback is what makes the timing honest.
        return np.asarray(full_step(variables, pixel_dev))

    pixel_dev = [jax.device_put(pixel_host) for _ in range(2)]

    # warmup / compile
    one_step(pixel_dev[0])

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        one_step(pixel_dev[0])
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))

    # throughput: 2 batches in flight (async dispatch overlaps the host-side
    # dispatch + readback of batch i with device compute of batch i+1)
    n_pipe = 2 * REPS
    t0 = time.perf_counter()
    pending = []
    for i in range(n_pipe):
        pending.append(full_step(variables, pixel_dev[i % 2]))
        if len(pending) >= 2:
            np.asarray(pending.pop(0))
    while pending:
        np.asarray(pending.pop(0))
    pipe_sec = time.perf_counter() - t0
    videos_per_sec = n_pipe * v / pipe_sec

    # the dev-tunnel H2D cost, reported for transparency
    h2d = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.device_put(pixel_host).block_until_ready()
        h2d.append(time.perf_counter() - t0)
    h2d_p50 = float(np.median(h2d))

    # single-stream latency: one datapoint (17 videos) end to end at batch 1 —
    # the "one narration" p50 the north star asks for (BASELINE.md:26)
    single = None
    if os.environ.get("BENCH_SINGLE_STREAM", "1") == "1" and batch != 1:
        ids1, mask1, vim1 = build_prompt(cfg, 1)
        ids1_d, mask1_d, vim1_d = (
            jnp.asarray(ids1, jnp.int32), jnp.asarray(mask1, jnp.int32), jnp.asarray(vim1, jnp.int32),
        )
        pixel1 = pixel_host[: SHOTS + 1]

        @jax.jit
        def single_step(variables, pixel_u8):
            pixel = process_videos(pixel_u8, dtype=jnp.bfloat16)
            embeds = model.apply(variables, ids1_d, pixel, vim1_d, method=VB.embed_and_scatter)
            return _greedy_sample_decoder_only(model, variables, embeds, mask1_d, gen_cfg, rng)

        pixel1_dev = jax.device_put(pixel1)
        np.asarray(single_step(variables, pixel1_dev))  # compile
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(single_step(variables, pixel1_dev))
            ts.append(time.perf_counter() - t0)
        single = float(np.median(ts))

    # ---------------------------------------------------------------------
    # Secondary serving-stratum legs (BENCH_SECONDARY=0 opts out). Each is
    # measured live in this run and failure-isolated: the headline number
    # never depends on them. Order matters for HBM: all bf16 legs first,
    # then quantize-and-free for the int8 operating point.
    # ---------------------------------------------------------------------
    secondary = os.environ.get("BENCH_SECONDARY", "1") == "1"
    warm_vps = None
    spec_stats = None
    int8_profile = None

    if secondary:
        # -- warm vision-feature cache, bf16 (the eval steady state: 16 of 17
        #    videos per datapoint recur — docs/PERF.md "Cross-request
        #    vision-feature cache") -------------------------------------------
        try:
            from eilev_tpu.serving import VideoFeatureCache

            pool_n = 256
            cache = VideoFeatureCache(
                model, variables, capacity=pool_n + 4096, bucket=4
            )
            pixel_bf16 = jax.jit(lambda p: process_videos(p, dtype=jnp.bfloat16))

            @jax.jit
            def decode_from_features(variables, feats):
                embeds = model.apply(
                    variables, ids_d, None, vim_d,
                    method=VB.embed_and_scatter, video_features=feats,
                )
                return _greedy_sample_decoder_only(
                    model, variables, embeds, mask_d, gen_cfg, rng
                )

            pool_px = pixel_bf16(pixel_dev[0])
            for s in range(0, pool_n, v):
                n = min(v, pool_n - s)
                cache.features([f"pool{s + i}" for i in range(n)], pool_px[:n])
            draw = np.random.default_rng(7)
            ctr = [0]

            def warm_step():
                keys = []
                for b in range(batch):
                    keys += [f"pool{k}" for k in draw.integers(0, pool_n, size=SHOTS)]
                    keys.append(f"q{ctr[0]}_{b}")
                ctr[0] += 1
                feats = cache.features(keys, pixel_bf16(pixel_dev[0]))
                return np.asarray(decode_from_features(variables, feats))

            warm_step()  # compile
            ws = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                warm_step()
                ws.append(time.perf_counter() - t0)
            warm_vps = v / float(np.median(ws))
            del cache, pool_px
        except Exception as e:  # pragma: no cover - keep the headline alive
            print(f"# warm-cache leg failed: {type(e).__name__}: {e}", flush=True)

        # -- prompt-lookup speculative decode, echo corpus (the alpha~1
        #    operating point of the 16-shot narration workload; token
        #    identity asserted on-chip) ---------------------------------------
        try:
            from eilev_tpu.generation.speculative import (
                build_lookup_corpus,
                prompt_lookup_greedy_decode,
            )
            from eilev_tpu.models.opt import OPTForCausalLM

            ids1, mask1s, vim1s = build_prompt(cfg, 1)
            embeds1 = jax.jit(
                lambda p: model.apply(
                    {"params": p}, jnp.asarray(ids1, jnp.int32), method=VB.lm_embed
                )
            )(params)
            mask1_d = jnp.asarray(mask1s, jnp.int32)
            target_lm = OPTForCausalLM(cfg.text_config, dtype=jnp.bfloat16)
            greedy1 = np.asarray(
                _greedy_sample_decoder_only(
                    model, variables, embeds1, mask1_d, gen_cfg, rng
                )
            )
            t0 = time.perf_counter()
            np.asarray(
                _greedy_sample_decoder_only(
                    model, variables, embeds1, mask1_d, gen_cfg, rng
                )
            )
            t_greedy1 = time.perf_counter() - t0
            echo = jnp.concatenate(
                [
                    build_lookup_corpus(
                        jnp.asarray(ids1, jnp.int32),
                        jnp.asarray(mask1s), jnp.asarray(vim1s),
                    ),
                    jnp.asarray(greedy1, jnp.int32),
                ],
                axis=1,
            )

            def pld():
                return prompt_lookup_greedy_decode(
                    target_lm, params["language_model"], echo, embeds1, mask1_d,
                    gen_cfg, gamma=8, match_len=3, return_stats=True,
                )

            out1, _ = pld()  # compile
            np.testing.assert_array_equal(np.asarray(out1), greedy1)
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                np.asarray(pld()[0])
                ts.append(time.perf_counter() - t0)
            _, (n_tok, iters) = pld()
            spec_stats = {
                "spec_tokens_per_pass": round(int(n_tok) / max(int(iters), 1), 2),
                "spec_speedup_vs_greedy": round(
                    t_greedy1 / float(np.median(ts)), 2
                ),
            }
        except Exception as e:  # pragma: no cover
            print(f"# spec leg failed: {type(e).__name__}: {e}", flush=True)

    # optional: the OPT-IN int8 weight-only serving mode (ops/quantization.py);
    # not the headline because the north star is bf16-parity greedy output
    int8_vps = None
    if os.environ.get("BENCH_INT8", "0") == "1":
        import dataclasses

        from eilev_tpu.ops.quantization import quantize_lm_params

        int8_vision = os.environ.get("BENCH_INT8_VISION", "0") == "1"
        int8_qformer = os.environ.get("BENCH_INT8_QFORMER", "0") == "1"
        qcfg = configs.replace(
            cfg,
            text_config=dataclasses.replace(
                cfg.text_config,
                quantize_matmuls=True,
                # BENCH_INT8_KV=1 additionally halves the decode cache stream
                # via the Pallas VMEM-dequant kernel (ops/decode_attention.py)
                int8_kv_cache=os.environ.get("BENCH_INT8_KV", "0") == "1",
                # BENCH_W8A8_PREFILL=1: prefill matmuls on the int8 MXU path
                w8a8_prefill=os.environ.get("BENCH_W8A8_PREFILL", "0") == "1",
            ),
        )
        if int8_vision:
            # BENCH_INT8_VISION=1: W8A8 vision GEMMs on the int8 MXU path
            qcfg = configs.replace(
                qcfg,
                vision_config=dataclasses.replace(
                    qcfg.vision_config, quantize_matmuls=True
                ),
            )
        if int8_qformer:
            qcfg = configs.replace(
                qcfg,
                qformer_config=dataclasses.replace(
                    qcfg.qformer_config, quantize_matmuls=True
                ),
            )
        qmodel = VideoBlipForConditionalGeneration(qcfg, dtype=jnp.bfloat16)

        @jax.jit
        def quantize(params):
            from eilev_tpu.ops.quantization import quantize_vision_params

            p = dict(params)
            p["language_model"] = quantize_lm_params(p["language_model"])
            if int8_vision:
                p["vision_model"] = quantize_vision_params(p["vision_model"])
            if int8_qformer:
                from eilev_tpu.ops.quantization import quantize_qformer_params

                p["qformer"] = quantize_qformer_params(p["qformer"])
            return p

        qvariables = {"params": quantize(params)}
        jax.block_until_ready(qvariables)
        # free the bf16 tree before timing: at batch >= 8 both models resident
        # oversubscribe the 16 GB chip (measured ResourceExhausted)
        del params, variables
        import gc

        gc.collect()

        @jax.jit
        def full_step_int8(variables, pixel_u8):
            pixel = process_videos(pixel_u8, dtype=jnp.bfloat16)
            # honor BENCH_VISION_CHUNKS like the bf16 leg: at batch >= 8 the
            # monolithic ViT spills HBM and would understate the int8 gain
            embeds = embed_and_scatter_chunked(
                qmodel, variables, ids_d, pixel, vim_d, vision_chunks=vision_chunks
            )
            return _greedy_sample_decoder_only(qmodel, variables, embeds, mask_d, gen_cfg, rng)

        np.asarray(full_step_int8(qvariables, pixel_dev[0]))  # compile
        t0 = time.perf_counter()
        pending = []
        for i in range(n_pipe):
            pending.append(full_step_int8(qvariables, pixel_dev[i % 2]))
            if len(pending) >= 2:
                np.asarray(pending.pop(0))
        while pending:
            np.asarray(pending.pop(0))
        int8_vps = n_pipe * v / (time.perf_counter() - t0)

    # -- combined serving operating point: warm cache x int8-lm+int8-kv x
    #    fast-gelu at batch 8 (docs/PERF.md "Combined serving profile"). Runs
    #    LAST: quantizes then FREES the bf16 tree (both resident at batch 8
    #    oversubscribe the 16 GB chip). Skipped when BENCH_INT8=1 already
    #    consumed the bf16 params above. Opt out: BENCH_SECONDARY=0. --------
    if secondary and int8_vps is None:
        try:
            import dataclasses
            import gc

            from eilev_tpu.ops.gelu import set_gelu_impl
            from eilev_tpu.ops.quantization import quantize_lm_params
            from eilev_tpu.serving import VideoFeatureCache

            set_gelu_impl("fast")
            p_batch = int(os.environ.get("BENCH_PROFILE_BATCH", "8"))
            p_v = p_batch * (SHOTS + 1)
            p_ids, p_mask, p_vim = build_prompt(cfg, p_batch)
            p_ids_d = jnp.asarray(p_ids, jnp.int32)
            p_mask_d = jnp.asarray(p_mask, jnp.int32)
            p_vim_d = jnp.asarray(p_vim, jnp.int32)

            qcfg = configs.replace(
                cfg,
                text_config=dataclasses.replace(
                    cfg.text_config, quantize_matmuls=True, int8_kv_cache=True
                ),
            )
            qmodel = VideoBlipForConditionalGeneration(qcfg, dtype=jnp.bfloat16)

            @jax.jit
            def quantize_q(params):
                p = dict(params)
                p["language_model"] = quantize_lm_params(p["language_model"])
                return p

            qvariables = {"params": quantize_q(params)}
            jax.block_until_ready(qvariables)
            del params, variables, pixel_dev
            gc.collect()

            pool_n = 256
            qcache = VideoFeatureCache(
                qmodel, qvariables, capacity=pool_n + 4096, bucket=4
            )
            pixel_bf16_q = jax.jit(lambda p: process_videos(p, dtype=jnp.bfloat16))
            # one datapoint of frames feeds every miss encode: feature identity
            # doesn't matter for throughput, only the encode count does
            p_pixel = jax.device_put(pixel_host[: SHOTS + 1])
            p_px16 = pixel_bf16_q(jnp.tile(p_pixel, (p_batch, 1, 1, 1, 1)))
            for s in range(0, pool_n, p_v):
                n = min(p_v, pool_n - s)
                qcache.features([f"pool{s + i}" for i in range(n)], p_px16[:n])

            @jax.jit
            def decode_from_features_q(variables, feats):
                embeds = qmodel.apply(
                    variables, p_ids_d, None, p_vim_d,
                    method=VB.embed_and_scatter, video_features=feats,
                )
                return _greedy_sample_decoder_only(
                    qmodel, variables, embeds, p_mask_d, gen_cfg, rng
                )

            draw_q = np.random.default_rng(11)
            qctr = [0]

            def warm_step_q():
                keys = []
                for b in range(p_batch):
                    keys += [
                        f"pool{k}" for k in draw_q.integers(0, pool_n, size=SHOTS)
                    ]
                    keys.append(f"q{qctr[0]}_{b}")
                qctr[0] += 1
                feats = qcache.features(keys, p_px16)
                return np.asarray(decode_from_features_q(qvariables, feats))

            warm_step_q()  # compile
            qs = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                warm_step_q()
                qs.append(time.perf_counter() - t0)
            int8_profile = p_v / float(np.median(qs))
        except Exception as e:  # pragma: no cover
            print(f"# int8-profile leg failed: {type(e).__name__}: {e}", flush=True)

    out = {
        # vs_baseline is ESTIMATE-derived: the reference publishes no
        # machine-readable throughput (see module docstring)
        "metric": "videos/sec, 16-shot ICL greedy narration (blip2-opt-2.7b geom, 8-frame 224^2 clips, bf16, 1 chip, 2 batches in flight, device-resident input - dev-tunnel H2D reported separately in h2d_*; vs_baseline vs ESTIMATED 3.45 videos/s/A40)",
        "value": round(videos_per_sec, 3),
        "unit": "videos/sec",
        "vs_baseline": round(videos_per_sec / EST_REFERENCE_VIDEOS_PER_SEC_PER_ACCEL, 3),
        "p50_batch_latency_sec": round(p50, 4),
        "p50_per_narration_sec": round(p50 / batch, 4),
        "h2d_batch_sec_dev_tunnel": round(h2d_p50, 4),
        "h2d_batch_mb": round(pixel_host.nbytes / 1e6, 1),
        "batch": batch,
        "max_new_tokens": MAX_NEW_TOKENS,
    }
    if single is not None:
        out["single_stream_latency_sec"] = round(single, 4)
    if int8_vps is not None:
        out["videos_per_sec_int8_lm"] = round(int8_vps, 3)
    # secondary serving/training strata, measured live this run (see legs above)
    if warm_vps is not None:
        out["warm_cache_videos_per_sec"] = round(warm_vps, 3)
    if spec_stats is not None:
        out.update(spec_stats)
    if int8_profile is not None:
        out["int8_profile_videos_per_sec"] = round(int8_profile, 3)
        out["int8_profile_batch"] = int(os.environ.get("BENCH_PROFILE_BATCH", "8"))
    if train is not None:
        out["train_videos_per_sec"] = train["videos_per_sec"]
        out["train_s_per_step"] = train["s_per_step"]
        out["train_variant"] = train["variant"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
