"""Training/eval data pipelines: dataset -> tokenized, padded, device-ready batches.

Reproduces the train_v2 preprocessing recipe (/root/reference/scripts/general/
train_v2.py:30-75): per example an instruction prompt drawn from the
InstructBLIP-style pool, cleaned narration text, the interleaved prompt builder,
and the augmentation stack - then collates to STATIC shapes (fixed videos per
sample, token length padded to a fixed bucket) so the jitted train step never
recompiles, and stacks ``gradient_accumulation`` microbatches.

Augmentation runs on device through ops.preprocess (one fused program per clip
batch) instead of torchvision on CPU workers.
"""

from __future__ import annotations

import random as _random
from dataclasses import dataclass
from typing import Any, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.collate import DataCollatorForInterleavedVideoSeq2Seq
from ..data.prompts import generate_input_ids_and_labels, generate_input_ids_and_labels_from_interleaved
from ..data.text import clean_narration_text
from ..ops.preprocess import process_videos, train_transform

# Based on prompts from InstructBLIP (reference train_v2.py:30-42)
PROMPTS = [
    "What is the camera wearer doing?",
    "Question: What is the camera wearer doing?",
    "What is the camera wearer doing? An answer to the question is",
    "Q: What is the camera wearer doing? A:",
    "Given the video, answer the following question. What is the camera wearer doing?",
    "Based on the video, respond to this question: What is the camera wearer doing? "
    "Answer:",
    "Use the provided video to answer the question: What is the camera wearer doing?",
    'What is the answer to the following question? "What is the camera wearer doing?"',
    'The question "What is the camera wearer doing?" can be answered using the video. '
    "The answer is",
]

# v1's fixed prompt (reference train_v1.py:20)
V1_PROMPT = "Question: What is the camera wearer doing? Answer:"


@dataclass
class InterleavedPreprocessor:
    """datapoint {'items': [...examples, query]} -> tokenized features + raw
    uint8 clip stack (augmentation happens later, on device)."""

    tokenizer: Any
    num_query_tokens: int
    decoder_only_lm: bool
    rng: _random.Random

    def draw_prompts(self, n_items: int) -> list[str]:
        """The rng-consuming half: one instruction prompt per item, drawn in
        stream order on the coordinating thread (same sequence as serial)."""
        return [self.rng.choice(PROMPTS) for _ in range(n_items)]

    def apply(self, datapoint: dict[str, Any], prompts: list[str]) -> dict[str, Any]:
        """The rng-free half: tokenize + assemble. Worker-thread safe."""
        items = datapoint["items"]
        features = generate_input_ids_and_labels_from_interleaved(
            self.tokenizer,
            [
                (
                    prompt + " " + clean_narration_text(item["narration_text"]),
                    1,
                )
                for prompt, item in zip(prompts[:-1], items[:-1])
            ]
            + [(prompts[-1], 1)],
            clean_narration_text(items[-1]["narration_text"]),
            self.num_query_tokens,
            self.decoder_only_lm,
        )
        features["pixel_values"] = np.stack([item["video"] for item in items])
        return features

    def __call__(self, datapoint: dict[str, Any]) -> dict[str, Any]:
        return self.apply(datapoint, self.draw_prompts(len(datapoint["items"])))


@dataclass
class V1Preprocessor:
    """Single-video (v1) preprocessing (reference train_v1.py:20-46)."""

    tokenizer: Any
    decoder_only_lm: bool
    prompt: str = V1_PROMPT

    def __call__(self, item: dict[str, Any]) -> dict[str, Any]:
        features = generate_input_ids_and_labels(
            self.tokenizer,
            self.prompt,
            clean_narration_text(item["narration_text"]),
            self.decoder_only_lm,
        )
        features["pixel_values"] = item["video"]
        return features


def _ordered_parallel(fn, tasks, num_workers: int, depth: Optional[int] = None):
    """Map ``fn`` over ``tasks`` on a thread pool, yielding IN ORDER with at
    most ``depth`` items in flight (the TPU-side replacement for the
    reference's DataLoader worker processes, SURVEY §3.1 — PNG decode and
    tokenization release the GIL in their C cores, so threads scale)."""
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    depth = depth or num_workers * 2
    with ThreadPoolExecutor(num_workers) as ex:
        pending: deque = deque()
        for t in tasks:
            pending.append(ex.submit(fn, t))
            if len(pending) >= depth:
                yield pending.popleft().result()
        while pending:
            yield pending.popleft().result()


def train_batch_iterator(
    dataset,
    tokenizer,
    *,
    num_query_tokens: int,
    decoder_only_lm: bool,
    accum_steps: int,
    micro_batch_size: int,
    max_length: int,
    num_frames: int,
    image_size: int = 224,
    augment: bool = True,
    augment_magnitude: float = 5.0,
    seed: int = 0,
    epochs: Optional[int] = None,
    dtype=jnp.float32,
    interleaved: bool = True,
    process_index: int = 0,
    process_count: int = 1,
    num_workers: int = 0,
) -> Iterator[dict[str, np.ndarray]]:
    """Yields static-shape batches: every array (accum, micro, ...); token axes
    padded to ``max_length``; pixel_values (accum, micro*videos, C, T, H, W).

    Over-long samples are truncated to max_length from the RIGHT for labels/ids
    (keeps the video tokens, which sit at the front).

    Multi-host: pass ``process_index``/``process_count`` and a PER-HOST
    ``micro_batch_size``; each host loads a disjoint strided shard of the
    same seeded shuffle, and ``trainer.shard_train_batch`` assembles the
    host-local batches into one global sharded array.

    ``num_workers > 0`` overlaps the per-sample frame IO + tokenization on a
    thread pool. The rng-consuming halves (in-context example choice, prompt
    choice) run on the coordinating thread in stream order, so the batches
    are BIT-IDENTICAL to serial iteration for the same seed
    (tests/training/test_data_module.py). Requires a dataset exposing
    ``plan``/``load_plan`` (FrameInterleavedDataset) in interleaved mode.
    """
    rng = _random.Random(seed)
    key = jax.random.PRNGKey(seed)
    if interleaved:
        pre: Any = InterleavedPreprocessor(tokenizer, num_query_tokens, decoder_only_lm, rng)
        collator = DataCollatorForInterleavedVideoSeq2Seq(
            pad_token_id=tokenizer.pad_token_id, padding_side="right", pad_to_multiple_of=None
        )
    else:
        pre = V1Preprocessor(tokenizer, decoder_only_lm)
        from ..data.collate import DataCollatorForVideoSeq2Seq

        collator = DataCollatorForVideoSeq2Seq(
            pad_token_id=tokenizer.pad_token_id, padding_side="right", pad_to_multiple_of=None
        )

    if num_workers > 0 and not (
        interleaved and hasattr(dataset, "plan") and hasattr(dataset, "load_plan")
    ):
        raise ValueError(
            "num_workers > 0 needs an interleaved dataset with plan/load_plan "
            "(FrameInterleavedDataset); other datasets iterate serially"
        )

    def sample_stream():
        epoch = 0
        while epochs is None or epoch < epochs:
            order = list(range(len(dataset)))
            rng.shuffle(order)
            # multi-host: every process shuffles identically (same seed), then
            # takes its stride — disjoint shards, no coordination traffic
            # (reference equivalent: torch DistributedSampler)
            shard = order[process_index::process_count]
            if num_workers > 0:
                # all rng draws happen HERE, in stream order; workers only do
                # frame IO + tokenization (load_plan/apply are rng-free)
                def tasks():
                    for i in shard:
                        plan = dataset.plan(i)
                        yield plan, pre.draw_prompts(len(plan[0]) + 1)

                yield from _ordered_parallel(
                    lambda t: pre.apply(dataset.load_plan(t[0]), t[1]),
                    tasks(),
                    num_workers,
                )
            else:
                for i in shard:
                    yield pre(dataset[i])
            epoch += 1

    def fix_length(arr: np.ndarray, pad_value: int) -> np.ndarray:
        if arr.shape[1] >= max_length:
            return arr[:, :max_length]
        out = np.full((arr.shape[0], max_length), pad_value, arr.dtype)
        out[:, : arr.shape[1]] = arr
        return out

    stream = sample_stream()
    micro_total = accum_steps * micro_batch_size
    while True:
        feats = []
        try:
            for _ in range(micro_total):
                feats.append(next(stream))
        except StopIteration:
            return
        batch = collator(feats)
        ids = fix_length(batch["input_ids"], tokenizer.pad_token_id)
        mask = fix_length(batch["attention_mask"], 0)
        labels = fix_length(batch["labels"], -100)

        pixels = batch["pixel_values"]  # (total_videos, C, T0, H0, W0) uint8
        key, sub = jax.random.split(key)
        if augment:
            keys = jax.random.split(sub, pixels.shape[0])
            proc = jax.vmap(
                lambda k, v: train_transform(
                    k, v, num_frames=num_frames, height=image_size, width=image_size,
                    magnitude=augment_magnitude, dtype=dtype,
                )
            )(keys, jnp.asarray(pixels))
        else:
            proc = process_videos(
                jnp.asarray(pixels), num_frames=num_frames, height=image_size,
                width=image_size, dtype=dtype,
            )
        proc = np.asarray(proc)

        out = {
            "input_ids": ids.reshape(accum_steps, micro_batch_size, max_length),
            "attention_mask": mask.reshape(accum_steps, micro_batch_size, max_length),
            "labels": labels.reshape(accum_steps, micro_batch_size, max_length),
            "pixel_values": proc.reshape(accum_steps, -1, *proc.shape[1:]),
        }
        if "video_input_mask" in batch:
            vim = fix_length(batch["video_input_mask"], 0)
            # the device-side scatter places exactly (num_videos * num_query
            # tokens) features at mask positions and clips silently; a truncated
            # video slot would corrupt training, so fail loudly here instead
            expected = pixels.shape[0] * num_query_tokens
            if int(vim.sum()) != expected:
                raise ValueError(
                    f"max_length={max_length} truncates video token positions "
                    f"({int(vim.sum())} mask slots for {expected} video features); "
                    "raise --max_length"
                )
            out["video_input_mask"] = vim.reshape(accum_steps, micro_batch_size, max_length)
        yield out
