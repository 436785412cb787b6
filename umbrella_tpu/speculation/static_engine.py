"""Static-tree speculation engine (Sequoia growmap trees).

Behavioral counterpart of the reference's `StaticSpeculationEngine`
(`umbrella/speculation/static_speculation_engine.py`), re-architected for XLA:

- The ENTIRE tree build (all draft levels + expansion sampling) is ONE jitted
  computation with each level's exact static shapes unrolled — replacing the
  reference's per-level CUDA-graph replays + graphed samplers (ref :257-281,
  spec_utils:222-257). One dispatch instead of ~2*depth.
- Verify (target forward over the tree, repetition penalty, sampling, the Sequoia
  token-match accept rule, bonus token, EOS scan, KV compaction of BOTH caches, and
  state advance) is ONE jitted computation (ref :283-351 spread over many launches).
- No persistent O(L^2) masks; each phase computes its own rows (ops/masks.py).
- KV buffers and the token buffer are donated — XLA updates them in place.

The accept rule (ref :313-321): node v is accepted iff its speculated token matches
the target-sampled token of its parent, for v and all ancestors; implemented as
ancestor-bitmap-weighted count == path length.
"""
from __future__ import annotations

import functools
import time
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models.auto_model import AutoModelLM, ModelRuntime
from ..models.kv_cache import gather_compact
from ..ops import sampling as S
from ..ops.masks import causal_mask_rows, tree_level_mask_rows, tree_mask_rows
from ..utils import TextColors, setup_logger
from .base import BaseEngine
from .spec_utils import is_sentence_complete_regex, next_bucket
from .tree import GrowMap

logger = setup_logger()

PREFILL_BUCKETS = (32, 64, 128, 256, 512)
PREFILL_CHUNK = 512


class StaticEngine(BaseEngine):
    def __init__(
        self,
        draft_model_name: Union[str, ModelRuntime],
        target_model_name: Union[str, ModelRuntime],
        dtype=jnp.bfloat16,
        device: Optional[str] = None,  # kept for config parity; jax picks the backend
        **kwargs,
    ) -> None:
        self.draft_model_name = draft_model_name
        self.target_model_name = target_model_name
        self.dtype = dtype
        self.device = device
        self.growmap_path = kwargs.pop("growmap_path", None)
        self.growmap_obj = kwargs.pop("growmap", None)
        assert self.growmap_path is not None or self.growmap_obj is not None, (
            "Please specify growmap path (or growmap object) for static trees"
        )
        self.max_length = kwargs.pop("max_length", 8192)
        self.stop_distance = kwargs.pop("stop_distance", 32)
        self.safe_buffer = kwargs.pop("safe_buffer", 64)
        self.temperature = kwargs.pop("temperature", 0.0)
        self.topp = kwargs.pop("topp", 0.9)
        self.repetition_penalty = kwargs.pop("repetition_penalty", 1.0)
        self.topk = kwargs.pop("topk", 32)
        self.tokenizer = kwargs.pop("tokenizer", None)
        self.eos_token_ids = kwargs.pop("eos_token_ids", None)
        self.seed = kwargs.pop("seed", 0)
        self.config = kwargs

    # ------------------------------------------------------------------ setup

    def _load_model(self, spec, offload: bool) -> ModelRuntime:
        if isinstance(spec, str):
            return AutoModelLM.from_pretrained(
                spec, offload=offload, max_length=self.max_length, dtype=self.dtype,
                **self.config,
            )
        return spec

    def initialize(self):
        if self.growmap_obj is not None:
            gm = self.growmap_obj if isinstance(self.growmap_obj, GrowMap) else GrowMap.from_dict(self.growmap_obj)
        else:
            gm = GrowMap.from_json(self.growmap_path)
        gm.validate()
        self.growmap = gm
        self.tree_size = gm.size
        self.tree_depth = gm.num_levels
        logger.info(TextColors.colorize(
            f"Tree Size {self.tree_size - 1} | Tree Depth {self.tree_depth - 1}", "magenta"))

        self.draft_model = self._load_model(self.draft_model_name, offload=False)
        self.target_model = self._load_model(
            self.target_model_name, offload=self.config.get("offload", False))

        if self.tokenizer is None and isinstance(self.target_model_name, str):
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(self.target_model_name)

        if self.eos_token_ids is None:
            self.eos_token_ids = self.target_model.eos_ids or [-1]

        # --- static device constants baked per growmap
        self._bitmap = jnp.asarray(gm.bitmap)
        self._depth = jnp.asarray(gm.depth, jnp.int32)
        self._parents = jnp.asarray(gm.parents, jnp.int32)
        self._node_in_path = jnp.asarray(gm.node_in_path, jnp.int32)
        self._eos_arr = jnp.asarray(np.asarray(self.eos_token_ids, np.int32))

        # --- engine state
        self.tokens_host = np.zeros(self.max_length, np.int32)
        self.tokens = jnp.zeros(self.max_length, jnp.int32)
        self.kv_draft = self.draft_model.init_kv()
        self.kv_target = self.target_model.init_kv()
        self.num_nodes = 0
        self._num_nodes_dev = jnp.int32(0)
        self._key = jax.random.PRNGKey(self.seed)

        self._build_jitted_phases()

    # -------------------------------------------------------- jitted phases

    def _build_jitted_phases(self):
        gm = self.growmap
        L = self.max_length
        d_fwd = self.draft_model.forward
        t_fwd = self.target_model.forward
        fused_target = self.target_model.supports_fused_phases

        level_meta = []
        for lvl in range(gm.num_levels):
            level_meta.append(dict(
                start=gm.level_start(lvl),
                n=len(gm.roots[lvl]),
                nodes=jnp.asarray(gm.level_nodes(lvl)),
                depth=jnp.asarray(gm.depth[gm.level_nodes(lvl)], jnp.int32),
                topk=gm.level_topk(lvl) if lvl < gm.num_levels - 1 else 0,
                gather=jnp.asarray(gm.level_gather_indices(lvl)) if lvl < gm.num_levels - 1 else None,
            ))

        bitmap = self._bitmap

        def build_tree_fn(pd, kv_d, tokens, num_nodes):
            for lvl, m in enumerate(level_meta):
                ids = jax.lax.dynamic_slice(tokens, (num_nodes + m["start"],), (m["n"],))
                pos = num_nodes + m["depth"]
                mask = tree_level_mask_rows(num_nodes, bitmap, m["nodes"], L)
                logits, kv_d = d_fwd(pd, kv_d, ids, pos, mask, num_nodes + m["start"])
                if m["topk"] > 0:
                    cand = jax.lax.top_k(logits, m["topk"])[1].reshape(-1)
                    new_tokens = cand[m["gather"]].astype(jnp.int32)
                    tokens = jax.lax.dynamic_update_slice(
                        tokens, new_tokens, (num_nodes + m["start"] + m["n"],))
            return tokens, kv_d

        self._build_tree = jax.jit(build_tree_fn, donate_argnums=(1, 2))

        depth_all = self._depth
        parents = self._parents
        node_in_path = self._node_in_path
        eos_arr = self._eos_arr
        tree_size = gm.size

        def verify_tail_fn(logits, kv_t, kv_d, tokens, num_nodes, key,
                           temperature, topp, penalty, *, greedy, topk, use_pen):
            """Everything after the target forward — shared by fused/offload paths."""
            ids = jax.lax.dynamic_slice(tokens, (num_nodes,), (tree_size,))
            if use_pen:
                logits = S.apply_repetition_penalty(logits, tokens, num_nodes + 1, penalty)
            if greedy:
                sampled = S.greedy_sample(logits)
            else:
                sampled = S.sample_top_k_top_p(key, logits, temperature, topk, topp)
            sampled = sampled.astype(jnp.int32)

            accept = (sampled[parents] == ids).at[0].set(True)
            anc_count = jnp.sum(bitmap.astype(jnp.int32) * accept[None, :].astype(jnp.int32), axis=-1)
            path_ok = anc_count == node_in_path
            accept_len0 = jnp.sum(path_ok).astype(jnp.int32)
            iota = jnp.arange(tree_size, dtype=jnp.int32)
            path = jnp.sort(jnp.where(path_ok, iota, tree_size))
            path = jnp.clip(path, 0, tree_size - 1)
            last = jnp.max(jnp.where(path_ok, iota, -1))
            bonus = sampled[last]

            acc_tokens = ids[path]
            old_block = jax.lax.dynamic_slice(tokens, (num_nodes,), (tree_size + 1,))
            bidx = jnp.arange(tree_size + 1, dtype=jnp.int32)
            acc_pad = jnp.concatenate([acc_tokens, acc_tokens[-1:]])
            block = jnp.where(bidx < accept_len0, acc_pad,
                              jnp.where(bidx == accept_len0, bonus, old_block))
            tokens = jax.lax.dynamic_update_slice(tokens, block, (num_nodes,))

            eos_pos = S.find_first_in_set(block, eos_arr, accept_len0 + 1)
            eos_found = eos_pos >= 0
            accept_len = jnp.where(eos_found, eos_pos, accept_len0).astype(jnp.int32)

            gather_idx = num_nodes + path
            kv_t = gather_compact(kv_t, gather_idx, num_nodes, accept_len)
            kv_d = gather_compact(kv_d, gather_idx, num_nodes, accept_len)
            return tokens, kv_t, kv_d, num_nodes + accept_len, accept_len, eos_found, block

        def verify_fn(pt, kv_t, kv_d, tokens, num_nodes, key,
                      temperature, topp, penalty, *, greedy, topk, use_pen):
            ids = jax.lax.dynamic_slice(tokens, (num_nodes,), (tree_size,))
            pos = num_nodes + depth_all
            mask = tree_mask_rows(num_nodes, bitmap, L)
            logits, kv_t = t_fwd(pt, kv_t, ids, pos, mask, num_nodes)
            return verify_tail_fn(logits, kv_t, kv_d, tokens, num_nodes, key,
                                  temperature, topp, penalty,
                                  greedy=greedy, topk=topk, use_pen=use_pen)

        self._verify_cache = {}
        self._verify_tail_cache = {}
        self._fused_target = fused_target

        def get_verify(greedy, topk, use_pen):
            k = (greedy, topk, use_pen)
            if k not in self._verify_cache:
                self._verify_cache[k] = jax.jit(
                    functools.partial(verify_fn, greedy=greedy, topk=topk, use_pen=use_pen),
                    donate_argnums=(1, 2, 3),
                )
            return self._verify_cache[k]

        def get_verify_tail(greedy, topk, use_pen):
            k = (greedy, topk, use_pen)
            if k not in self._verify_tail_cache:
                self._verify_tail_cache[k] = jax.jit(
                    functools.partial(verify_tail_fn, greedy=greedy, topk=topk, use_pen=use_pen),
                    donate_argnums=(1, 2, 3),
                )
            return self._verify_tail_cache[k]

        self._get_verify = get_verify
        self._get_verify_tail = get_verify_tail
        self._tree_pos = lambda num_nodes: num_nodes + depth_all
        self._tree_mask = lambda num_nodes: tree_mask_rows(num_nodes, bitmap, L)

        # --- prefill/append chunks (bucketed static shapes)
        d_fused = self.draft_model.supports_fused_phases

        def prefill_chunk_fn(pd, pt, kv_d, kv_t, tokens, start, n_valid, *, bucket, emit):
            ids = jax.lax.dynamic_slice(tokens, (start,), (bucket,))
            pos = start + jnp.arange(bucket, dtype=jnp.int32)
            mask = causal_mask_rows(start, bucket, L)
            _, kv_d = d_fwd(pd, kv_d, ids, pos, mask, start)
            logits, kv_t = t_fwd(pt, kv_t, ids, pos, mask, start)
            if emit:
                next_tok = jnp.argmax(logits[n_valid - 1]).astype(jnp.int32)
                tokens = jax.lax.dynamic_update_slice(tokens, next_tok[None], (start + n_valid,))
            return tokens, kv_d, kv_t

        self._prefill_cache = {}

        def get_prefill(bucket, emit):
            k = (bucket, emit)
            if k not in self._prefill_cache:
                self._prefill_cache[k] = jax.jit(
                    functools.partial(prefill_chunk_fn, bucket=bucket, emit=emit),
                    donate_argnums=(2, 3, 4),
                )
            return self._prefill_cache[k]

        self._get_prefill = get_prefill

    # ------------------------------------------------------------ prefill

    def prefill(self, text: str):
        ids = self.tokenizer.encode(text)
        return self._prefill(np.asarray(ids, np.int32))

    def append(self, text: str):
        ids = self.tokenizer.encode(text)
        return self._append(np.asarray(ids[1:], np.int32))

    def _run_prefix(self, start: int, n_valid: int):
        """Forward tokens[start : start+n_valid] through both models in chunks and
        emit the next token at tokens[start+n_valid]."""
        pd, pt = self.draft_model.params, self.target_model.params
        off = 0
        while n_valid - off > PREFILL_CHUNK:
            fn = self._get_prefill(PREFILL_CHUNK, False)
            self.tokens, self.kv_draft, self.kv_target = fn(
                pd, pt, self.kv_draft, self.kv_target, self.tokens,
                jnp.int32(start + off), jnp.int32(PREFILL_CHUNK))
            off += PREFILL_CHUNK
        rem = n_valid - off
        bucket = next_bucket(rem, PREFILL_BUCKETS)
        fn = self._get_prefill(bucket, True)
        self.tokens, self.kv_draft, self.kv_target = fn(
            pd, pt, self.kv_draft, self.kv_target, self.tokens,
            jnp.int32(start + off), jnp.int32(rem))

    def _prefill(self, input_ids) -> bool:
        input_ids = np.asarray(input_ids, np.int32).reshape(-1)
        prefix_len = len(input_ids)
        if prefix_len >= self.max_length - 2 * self.safe_buffer:
            return False
        self.tokens_host[:prefix_len] = input_ids
        self.tokens = jnp.asarray(self.tokens_host)
        self._run_prefix(0, prefix_len)
        self.num_nodes = prefix_len
        self.tokens_host[: prefix_len + 1] = np.asarray(self.tokens[: prefix_len + 1])
        return True

    def _append(self, input_ids) -> bool:
        input_ids = np.asarray(input_ids, np.int32).reshape(-1)
        append_len = len(input_ids)
        if append_len + self.num_nodes >= self.max_length - 2 * self.safe_buffer:
            return False
        start = self.num_nodes
        # tokens[start] already holds last iteration's bonus token (ref :183-185)
        self.tokens_host[start + 1 : start + 1 + append_len] = input_ids
        self.tokens = jnp.asarray(self.tokens_host)
        n_valid = append_len + 1
        self._run_prefix(start, n_valid)
        self.num_nodes = start + n_valid
        self.tokens_host[: self.num_nodes + 1] = np.asarray(self.tokens[: self.num_nodes + 1])
        return True

    # ------------------------------------------------------------ decode core

    def build_tree(self):
        self.tokens, self.kv_draft = self._build_tree(
            self.draft_model.params, self.kv_draft, self.tokens, jnp.int32(self.num_nodes))

    def verify(self) -> bool:
        greedy = self.temperature < 0.05
        use_pen = self.repetition_penalty > 1.01
        self._key, sub = jax.random.split(self._key)
        num_nodes = jnp.int32(self.num_nodes)
        if self._fused_target:
            fn = self._get_verify(greedy, self.topk, use_pen)
            out = fn(self.target_model.params, self.kv_target, self.kv_draft,
                     self.tokens, num_nodes, sub,
                     jnp.float32(max(self.temperature, 1e-3)), jnp.float32(self.topp),
                     jnp.float32(self.repetition_penalty))
        else:
            # offload target: layer-streamed forward outside jit, fused tail inside
            ids = jax.lax.dynamic_slice(self.tokens, (num_nodes,), (self.tree_size,))
            pos = self._tree_pos(num_nodes)
            mask = self._tree_mask(num_nodes)
            logits, self.kv_target = self.target_model.streamed_forward(
                self.kv_target, ids, pos, mask, num_nodes)
            fn = self._get_verify_tail(greedy, self.topk, use_pen)
            out = fn(logits, self.kv_target, self.kv_draft, self.tokens, num_nodes, sub,
                     jnp.float32(max(self.temperature, 1e-3)), jnp.float32(self.topp),
                     jnp.float32(self.repetition_penalty))
        (self.tokens, self.kv_target, self.kv_draft,
         num_nodes_new, accept_len, eos_found, block) = out

        accept_len = int(accept_len)
        block = np.asarray(block)
        old = self.num_nodes
        self.num_nodes = old + accept_len
        self.tokens_host[old : old + self.tree_size + 1] = block
        return not bool(eos_found)

    # ------------------------------------------------------------ loops

    def validate_status(self) -> bool:
        return self.num_nodes <= (self.max_length - self.safe_buffer)

    def speculative_decoding(self, max_new_tokens: int = 128):
        max_new_tokens = max(max_new_tokens, self.stop_distance)
        jax.block_until_ready(self.tokens)
        t1 = time.time()
        large_model_step = 0
        decode = True
        start = self.num_nodes
        generated_ids = []
        pos = 0
        generated_text = [""]
        while decode and self.validate_status():
            begin = self.num_nodes
            self.build_tree()
            decode = self.verify()
            large_model_step += 1
            generated_ids.extend(self.tokens_host[begin : self.num_nodes].tolist())
            generated_text = self._decode_words(generated_ids)
            now = len(generated_text) - 1
            if now > pos:
                print(" ".join(generated_text[pos:now]), end=" ", flush=True)
                pos = now
            if (is_sentence_complete_regex(generated_text[-1])
                    and (self.num_nodes - start >= max_new_tokens - self.stop_distance)) \
                    or (self.num_nodes - start >= max_new_tokens):
                decode = False
        print(" ".join(generated_text[pos:]), flush=True)
        jax.block_until_ready(self.tokens)
        t2 = time.time()
        dec_len = self.num_nodes - start + 1
        logger.info(TextColors.colorize(
            "Avg Accept Tokens {:.2f} | TPOT {:.2f} ms ".format(
                dec_len / large_model_step, 1000 * (t2 - t1) / dec_len), "magenta"))
        return dec_len, (t2 - t1), large_model_step

    def _decode_words(self, generated_ids):
        if self.tokenizer is None:
            return [str(t) for t in generated_ids] or [""]
        return (self.tokenizer.decode(
            generated_ids, skip_special_tokens=True,
            clean_up_tokenization_spaces=False).strip().split(" "))

    def update_generation_args(self, **generation_args):
        self.temperature = generation_args.pop("temperature", self.temperature)
        self.topp = generation_args.pop("topp", self.topp)
        self.repetition_penalty = generation_args.pop("repetition_penalty", self.repetition_penalty)
        self.topk = generation_args.pop("topk", self.topk)

    def reset(self):
        self.num_nodes = 0
        self.tokens_host[:] = 0
        self.tokens = jnp.zeros(self.max_length, jnp.int32)
        self.kv_draft = self.draft_model.init_kv()
        self.kv_target = self.target_model.init_kv()

    # ------------------------------------------------------------ request API

    def _start_request(self, api_args):
        """Shared prefill handling; returns (ok, early_return_dict_or_None)."""
        input_ids = api_args.get("input_ids", None)
        max_new_tokens = api_args.get("max_new_tokens", 128)
        empty = dict(generated_text="", generated_tokens=[], avg_accept_tokens=0,
                     time_per_output_token=0)
        if input_ids is None:
            context = api_args.get("context", None)
            if context is None or len(context) == 0 or max_new_tokens == 0:
                api_args.update(empty)
                return False, api_args
            success = self.prefill(context)
        else:
            if len(input_ids) == 0 or max_new_tokens == 0:
                api_args.update(empty)
                return False, api_args
            success = self._prefill(np.asarray(input_ids, np.int32))
        if not success:
            api_args.update(empty)
            self.reset()
            return False, api_args
        return True, None

    def generate(self, **api_args):
        self.update_generation_args(**api_args)
        ok, early = self._start_request(api_args)
        if not ok:
            return early
        max_new_tokens = api_args.get("max_new_tokens", 128)

        jax.block_until_ready(self.tokens)
        t1 = time.time()
        large_model_step = 0
        decode = True
        start = self.num_nodes
        while decode and (self.num_nodes - start) < max_new_tokens and self.validate_status():
            self.build_tree()
            decode = self.verify()
            large_model_step += 1
        jax.block_until_ready(self.tokens)
        t2 = time.time()

        dec_len = self.num_nodes - start + 1
        out_tokens = self.tokens_host[start : self.num_nodes + 1].tolist()
        generated_text = (self.tokenizer.decode(
            out_tokens, skip_special_tokens=True, clean_up_tokenization_spaces=False)
            if self.tokenizer else "")
        api_args["generated_text"] = generated_text
        api_args["generated_tokens"] = out_tokens
        api_args["avg_accept_tokens"] = dec_len / large_model_step
        api_args["time_per_output_token"] = 1000 * (t2 - t1) / dec_len
        self.reset()
        return api_args

    def generate_stream(self, **api_args):
        self.update_generation_args(**api_args)
        ok, early = self._start_request(api_args)
        if not ok:
            yield "Exceeding reserved allowed context length", "Exceeding reserved allowed context length"
            return
        max_new_tokens = max(api_args.get("max_new_tokens", 128), self.stop_distance)

        jax.block_until_ready(self.tokens)
        t1 = time.time()
        large_model_step = 0
        decode = True
        start = self.num_nodes
        generated_ids = []
        pos = 0
        partial_text = ""
        generated_text_list = [""]
        while decode and self.validate_status():
            begin = self.num_nodes
            self.build_tree()
            decode = self.verify()
            large_model_step += 1
            generated_ids.extend(self.tokens_host[begin : self.num_nodes].tolist())
            generated_text_list = self._decode_words(generated_ids)
            now = len(generated_text_list) - 1
            if now > pos:
                partial_text += " ".join(generated_text_list[pos:now]) + " "
                t2 = time.time()
                dec_len = self.num_nodes - start + 1
                perf_log = "Output Tokens {} | Avg Accept Tokens {:.2f} | TPOT {:.2f} ms ".format(
                    dec_len, dec_len / large_model_step, 1000 * (t2 - t1) / dec_len)
                yield partial_text, perf_log
                pos = now
            if (is_sentence_complete_regex(generated_text_list[-1])
                    and (self.num_nodes - start >= max_new_tokens - self.stop_distance)) \
                    or ((self.num_nodes - start) >= max_new_tokens):
                decode = False

        final_piece = " ".join(generated_text_list[pos:])
        if final_piece:
            partial_text += final_piece
        t2 = time.time()
        dec_len = self.num_nodes - start + 1
        perf_log = "Output Tokens {} | Avg Accept Tokens {:.2f} | TPOT {:.2f} ms ".format(
            dec_len, dec_len / large_model_step, 1000 * (t2 - t1) / dec_len)
        yield partial_text, perf_log
        logger.info(TextColors.colorize(perf_log, "magenta"))
        self.reset()
