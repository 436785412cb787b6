"""Draft-model training script (reference `draft/train_draft.py`).

The reference trains a ~500M Mistral-vocab draft from scratch on SlimPajama with HF
Trainer (bf16, cosine LR, ctx 1024, periodic checkpointing `save_steps=5000`,
`save_total_limit=2`). TPU-native version: the jitted dp x tp train step from
umbrella_tpu.training over a device mesh, orbax-style numpy checkpointing, and
tokenized data from either HF datasets (if reachable) or a local token .npy /
newline-delimited text file.
"""
import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def load_token_stream(args, tokenizer):
    if args.data.endswith(".npy"):
        return np.load(args.data).astype(np.int32)
    if os.path.isfile(args.data):
        text = open(args.data).read()
        return np.asarray(tokenizer.encode(text), np.int32)
    # streaming HF dataset (requires network; reference streams SlimPajama)
    from datasets import load_dataset

    ds = load_dataset(args.data, split="train", streaming=True)
    toks = []
    for ex in ds:
        toks.extend(tokenizer.encode(ex["text"]))
        if len(toks) >= args.max_tokens:
            break
    return np.asarray(toks[: args.max_tokens], np.int32)


def save_checkpoint(path, state, step, keep=2):
    os.makedirs(path, exist_ok=True)
    fname = os.path.join(path, f"ckpt_{step}.pkl")
    host_state = jax.tree.map(np.asarray, state)
    with open(fname, "wb") as f:
        pickle.dump(host_state, f)
    ckpts = sorted(
        (f for f in os.listdir(path) if f.startswith("ckpt_")),
        key=lambda f: int(f.split("_")[1].split(".")[0]))
    for old in ckpts[:-keep]:  # save_total_limit=2 (ref train_draft.py:66)
        os.remove(os.path.join(path, old))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="draft/config.json")
    parser.add_argument("--data", type=str, default="DKYoon/SlimPajama-6B")
    parser.add_argument("--tokenizer", type=str, default="mistralai/Mistral-7B-Instruct-v0.3")
    parser.add_argument("--output_dir", type=str, default="draft/checkpoints")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--seq_len", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=10000)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--save_steps", type=int, default=5000)
    parser.add_argument("--max_tokens", type=int, default=50_000_000)
    parser.add_argument("--tp", type=int, default=1)
    parser.add_argument("--dp", type=int, default=0, help="0 = use remaining devices")
    args = parser.parse_args()

    from transformers import AutoTokenizer

    from umbrella_tpu.config import ModelConfig
    from umbrella_tpu.models.llama import StaticModelArgs, init_llama_params
    from umbrella_tpu.parallel.mesh import make_mesh, shard_params
    from umbrella_tpu.training import (
        init_train_state, make_optimizer, make_train_step)
    from jax.sharding import NamedSharding, PartitionSpec as P

    with open(args.config) as f:
        cfg = ModelConfig.from_dict(json.load(f))
    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    tokens = load_token_stream(args, tokenizer)
    n_windows = len(tokens) // args.seq_len
    windows = tokens[: n_windows * args.seq_len].reshape(n_windows, args.seq_len)
    print(f"{len(tokens)/1e6:.1f}M tokens -> {n_windows} windows of {args.seq_len}")

    dp = args.dp or max(len(jax.devices()) // args.tp, 1)
    mesh = make_mesh(model=args.tp, data=dp)
    params = shard_params(
        init_llama_params(cfg, jax.random.PRNGKey(0), args.seq_len, jnp.bfloat16,
                          packed=(args.tp == 1)), mesh)
    margs = StaticModelArgs.from_config(cfg)
    optimizer = make_optimizer(lr=args.lr, total_steps=args.steps)
    state = init_train_state(params, optimizer)
    train_step = jax.jit(make_train_step(margs, optimizer), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    batch_sharding = NamedSharding(mesh, P("data", None))
    t0 = time.time()
    for step in range(1, args.steps + 1):
        idx = rng.integers(0, n_windows, args.batch_size)
        batch = jax.device_put(windows[idx], batch_sharding)
        state, loss = train_step(state, batch)
        if step % 50 == 0:
            print(f"step {step} loss {float(loss):.4f} "
                  f"({step*args.batch_size*args.seq_len/(time.time()-t0)/1e3:.1f}K tok/s)")
        if step % args.save_steps == 0:
            save_checkpoint(args.output_dir, state, step)
    save_checkpoint(args.output_dir, state, args.steps)


if __name__ == "__main__":
    main()
