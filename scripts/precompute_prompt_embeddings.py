#!/usr/bin/env python
"""Precompute UMT5/T5 prompt embeddings for a training dataset.

The reference re-runs the frozen text encoder EVERY training step
(``train_code/train_wan_motion_FrameINO.py:1174-1182``); here the
unique prompts of a dataset CSV folder are embedded once into a
``PromptEmbeddingCache`` directory, which the train CLIs consume via
the ``prompt_embeds_cache`` config key (zero text-encoder cost per
step).

Usage:
    python scripts/precompute_prompt_embeddings.py \
        --csv_folder FrameINO_data/dataset_csv_files/... \
        --text_encoder_path <UMT5 checkpoint dir (config.json +
                             safetensors + tokenizer files)> \
        --output_dir FrameINO_data/prompt_cache \
        [--max_text_len 512] [--batch_size 8] [--kind umt5|t5]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--csv_folder", required=True)
    p.add_argument("--text_encoder_path", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--max_text_len", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--prompt_column", default="Structured_Text_Prompt")
    p.add_argument("--include_empty", action="store_true",
                   help="also cache the empty prompt (text dropout)")
    return p.parse_args()


def collect_prompts(csv_folder: str, column: str):
    from frameino_tpu.preprocess.csv_io import read_csv_folder, row_dict
    header, rows = read_csv_folder(csv_folder)
    prompts = set()
    for row in rows:
        d = row_dict(header, row)
        raw = d.get(column)
        if raw is None:
            continue
        try:
            vals = json.loads(raw)
        except json.JSONDecodeError:
            vals = [raw]
        for v in vals if isinstance(vals, list) else [vals]:
            if isinstance(v, str) and v:
                prompts.add(v)
    return sorted(prompts)


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from frameino_tpu.data.prompt_cache import PromptEmbeddingCache
    from frameino_tpu.models import pretrained, t5_encoder

    cfg, params = pretrained.from_pretrained(args.text_encoder_path)
    tokenizer = AutoTokenizer.from_pretrained(args.text_encoder_path)

    prompts = collect_prompts(args.csv_folder, args.prompt_column)
    if args.include_empty:
        prompts = [""] + prompts
    print(f"embedding {len(prompts)} unique prompts")

    cache = PromptEmbeddingCache(args.output_dir, args.max_text_len,
                                 cfg.d_model, create=True)

    encode = jax.jit(lambda ids, mask: t5_encoder.encode_and_mask(
        cfg, params, ids, mask, max_sequence_length=args.max_text_len))

    for i in range(0, len(prompts), args.batch_size):
        chunk = prompts[i:i + args.batch_size]
        tok = tokenizer(chunk, padding="max_length",
                        max_length=args.max_text_len, truncation=True,
                        return_tensors="np")
        emb = np.asarray(encode(jnp.asarray(tok["input_ids"]),
                                jnp.asarray(tok["attention_mask"])))
        for p, e in zip(chunk, emb):
            cache.put(p, e)
        print(f"  {min(i + args.batch_size, len(prompts))}/{len(prompts)}")
    print(f"wrote {len(cache)} embeddings -> {args.output_dir}")


if __name__ == "__main__":
    main()
