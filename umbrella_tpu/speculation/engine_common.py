"""Shared engine machinery: prefill/append chunking, host decode loops, request API.

The reference duplicates this across its two engines
(`static_speculation_engine.py` / `dynamic_speculation_engine.py`); here it lives once
and the engines supply only their tree build/verify phases.
"""
from __future__ import annotations

import functools
import time
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models.auto_model import AutoModelLM, ModelRuntime
from ..ops.masks import causal_mask_rows
from ..utils import TextColors, setup_logger
from .base import BaseEngine
from .spec_utils import is_sentence_complete_regex, next_bucket

logger = setup_logger()

PREFILL_BUCKETS = (32, 64, 128, 256, 512)
PREFILL_CHUNK = 512


class SpecEngineBase(BaseEngine):
    """Common state + loops; subclasses implement initialize/build_tree/verify."""

    ban_eos_at_prefill = False  # dynamic engine bans EOS as the first token (ref dynamic:130)

    def __init__(
        self,
        draft_model_name: Union[str, ModelRuntime],
        target_model_name: Union[str, ModelRuntime],
        dtype=jnp.bfloat16,
        device: Optional[str] = None,  # config parity; jax picks the backend
        **kwargs,
    ) -> None:
        self.draft_model_name = draft_model_name
        self.target_model_name = target_model_name
        self.dtype = dtype
        self.device = device
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
        self.kv_dtype = kwargs.pop("kv_dtype", None)  # None => model dtype; "int8" quantizes
        # draft tree expansion top-k: recall<1 => lax.approx_max_k (~5x faster at
        # V=128k on TPU; proposals only — committed output is unaffected, see
        # ops/sampling.draft_topk). 1.0 => exact lax.top_k.
        self.draft_topk_recall = float(kwargs.pop("draft_topk_recall", 0.99))
        # tensor_parallel: N shards the TARGET over an N-device ICI mesh
        # (Megatron column/row specs, shard_map forward — parallel/mesh.py) and
        # replicates the draft; the north-star 70B-AWQ pod config's serving axis.
        self.tensor_parallel = int(kwargs.pop("tensor_parallel", 0) or 0)
        # pipeline_parallel: N stages the TARGET's layer blocks over an N-device
        # 'pipe' mesh (per-stage KV, ppermute hops — parallel/pipeline.py). The
        # capacity axis for models whose W4 weights exceed one chip's HBM.
        self.pipeline_parallel = int(kwargs.pop("pipeline_parallel", 0) or 0)
        # expert_parallel: N shards a MoE TARGET's stacked expert tensors over an
        # N-device 'expert' mesh (models/moe.shard_runtime_ep — GSPMD partitions
        # the per-expert einsums and inserts one psum for the combine). The
        # config-reachable serving axis for the MoE family the reference lacks.
        self.expert_parallel = int(kwargs.pop("expert_parallel", 0) or 0)
        self.mesh = None
        self.config = kwargs

    # ------------------------------------------------------------ model setup

    def _load_model(self, spec, offload: bool, packed: bool = True) -> ModelRuntime:
        if isinstance(spec, str):
            return AutoModelLM.from_pretrained(
                spec, offload=offload, max_length=self.max_length, dtype=self.dtype,
                packed=packed, **self.config)
        return spec

    def _init_models_and_state(self):
        tp = self.tensor_parallel
        pp = self.pipeline_parallel
        ep = self.expert_parallel
        assert sum(int(x > 1) for x in (tp, pp, ep)) <= 1, (
            "tensor_parallel / pipeline_parallel / expert_parallel are mutually "
            "exclusive for now")
        if tp > 1:
            from ..parallel.mesh import make_mesh

            assert not self.config.get("offload", False), (
                "tensor_parallel and offload are mutually exclusive: TP shards "
                "resident weights over the mesh, offload streams them from host DRAM")
            self.mesh = make_mesh(model=tp)
        elif pp > 1:
            from jax.sharding import Mesh

            assert not self.config.get("offload", False), (
                "pipeline_parallel and offload are mutually exclusive: PP shards "
                "resident layer blocks over the mesh")
            from ..parallel.distributed import order_by_process

            # Stage hops are ppermute's — keep them on ICI: group devices by
            # process (host) and require the whole pipe to fit one host, instead
            # of letting a stage boundary silently straddle hosts over DCN.
            devices = order_by_process(jax.devices())
            assert len(devices) >= pp, f"need {pp} devices, have {len(devices)}"
            devices = devices[:pp]
            assert len({getattr(d, "process_index", 0) for d in devices}) == 1, (
                "pipeline_parallel stages must live on one host (ppermute rides "
                "ICI); use tensor_parallel + data-parallel hosts for multi-host")
            self.mesh = Mesh(np.asarray(devices), ("pipe",))
        elif ep > 1:
            from jax.sharding import Mesh

            assert not self.config.get("offload", False), (
                "expert_parallel and offload are mutually exclusive: EP shards "
                "resident expert tensors over the mesh")
            devices = jax.devices()
            assert len(devices) >= ep, f"need {ep} devices, have {len(devices)}"
            self.mesh = Mesh(np.asarray(devices[:ep]), ("expert",))
        self.draft_model = self._load_model(self.draft_model_name, offload=False)
        qd = self.config.get("quantize_draft", False)
        if qd and self.draft_model.family == "moe":
            raise ValueError("quantize_draft is not supported for MoE drafts "
                             "(dense-dispatch expert tensors stay bf16/fp32)")
        if qd == "int4f":
            # Int4F-requantize the draft (factorized-scale W4, full-K int8-MXU
            # dots at 2x the bf16 rate — quantization/int4f.py). Converts dense
            # AND AWQ drafts; the extra quantization error only moves the
            # acceptance rate, never output correctness.
            from ..quantization.int4f import (has_int4f_layers,
                                              quantize_runtime_int4f)

            if not has_int4f_layers(self.draft_model.params["layers"]):
                self.draft_model = quantize_runtime_int4f(self.draft_model)
        elif qd:
            # W4-quantize an fp draft in process (TPU extension; the draft re-reads
            # all its weights once per tree level, so W4 cuts build_tree HBM
            # traffic ~4x). No-op for drafts that are already AWQ checkpoints.
            from ..quantization.awq import has_awq_layers
            from ..quantization.loader import quantize_runtime

            if not has_awq_layers(self.draft_model.params["layers"]):
                # quantize_lm_head: the head matmul is the draft's biggest HBM
                # read per level (full [H, V], even when tied) — W4 it too.
                self.draft_model = quantize_runtime(
                    self.draft_model, dtype=self.dtype, quantize_lm_head=True)
        self.target_model = self._load_model(
            self.target_model_name, offload=self.config.get("offload", False),
            packed=(tp <= 1))
        if self.mesh is not None:
            from ..parallel.mesh import shard_runtime

            if ep > 1:
                from ..models.moe import shard_runtime_ep
                from ..parallel.mesh import replicate

                assert self.target_model.family == "moe", (
                    "expert_parallel requires an MoE (mixtral-family) target; "
                    f"got family '{self.target_model.family}'")
                E = self.target_model.cfg.num_local_experts or 0
                assert E % ep == 0, (
                    f"num_local_experts={E} must divide expert_parallel={ep}")
                if not getattr(self.target_model, "_mesh", None):
                    shard_runtime_ep(self.target_model, self.mesh)
                if not getattr(self.draft_model, "_mesh", None):
                    if self.draft_model.family == "moe":
                        shard_runtime_ep(self.draft_model, self.mesh)
                    else:
                        self.draft_model.params = replicate(
                            self.draft_model.params, self.mesh)
                        self.draft_model._mesh = self.mesh
            elif pp > 1:
                from ..parallel.mesh import replicate
                from ..parallel.pipeline import shard_runtime_pp

                if not getattr(self.target_model, "_pp", False):
                    shard_runtime_pp(self.target_model, self.mesh)
                if not getattr(self.draft_model, "_mesh", None):
                    self.draft_model.params = replicate(
                        self.draft_model.params, self.mesh)
                    self.draft_model._mesh = self.mesh
            else:
                if not getattr(self.target_model, "_tp", False):
                    shard_runtime(self.target_model, self.mesh)
                if not getattr(self.draft_model, "_mesh", None):
                    shard_runtime(self.draft_model, self.mesh, replicated=True)

        if self.tokenizer is None and isinstance(self.target_model_name, str):
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(self.target_model_name)
        if self.eos_token_ids is None:
            self.eos_token_ids = self.target_model.eos_ids or [-1]
        self._eos_arr = jnp.asarray(np.asarray(self.eos_token_ids, np.int32))

        self.tokens_host = np.zeros(self.max_length, np.int32)
        self.tokens = jnp.zeros(self.max_length, jnp.int32)
        self.kv_draft = self.draft_model.init_kv(kv_dtype=self.kv_dtype)
        self.kv_target = self.target_model.init_kv(kv_dtype=self.kv_dtype)
        self.num_nodes = 0
        self._key = jax.random.PRNGKey(self.seed)
        self._build_prefill_phase()

    # ------------------------------------------------------------ prefill

    def _build_prefill_phase(self):
        L = self.max_length
        d_fwd = self.draft_model.forward
        t_fused = self.target_model.supports_fused_phases
        t_fwd = self.target_model.forward if t_fused else None
        ban_eos = self.ban_eos_at_prefill

        def emit_token(logits_row, tokens, start, n_valid, eos):
            if ban_eos:
                # mask EOS logits without scatter: compare against each eos id
                vocab_iota = jax.lax.iota(jnp.int32, logits_row.shape[0])
                is_eos = jnp.any(vocab_iota[:, None] == eos[None, :], axis=-1)
                logits_row = jnp.where(is_eos, -jnp.inf, logits_row)
            next_tok = jnp.argmax(logits_row).astype(jnp.int32)
            tokens = jax.lax.dynamic_update_slice(tokens, next_tok[None], (start + n_valid,))
            return tokens, next_tok

        def chunk_fn(pd, pt, kv_d, kv_t, tokens, start, n_valid, eos, *, bucket, emit):
            ids = jax.lax.dynamic_slice(tokens, (start,), (bucket,))
            pos = start + jax.lax.iota(jnp.int32, bucket)
            mask = causal_mask_rows(start, bucket, L)
            _, kv_d = d_fwd(pd, kv_d, ids, pos, mask, start)
            logits, kv_t = t_fwd(pt, kv_t, ids, pos, mask, start)
            if emit:
                # select row n_valid-1 without an eager slice (download is full-array)
                row_sel = jax.lax.dynamic_slice(logits, (n_valid - 1, 0), (1, logits.shape[1]))[0]
                tokens, next_tok = emit_token(row_sel, tokens, start, n_valid, eos)
            else:
                next_tok = jnp.int32(0)
            return tokens, kv_d, kv_t, next_tok

        def chunk_draft_only_fn(pd, kv_d, tokens, start, *, bucket):
            ids = jax.lax.dynamic_slice(tokens, (start,), (bucket,))
            pos = start + jax.lax.iota(jnp.int32, bucket)
            mask = causal_mask_rows(start, bucket, L)
            _, kv_d = d_fwd(pd, kv_d, ids, pos, mask, start)
            return kv_d

        def emit_fn(logits, tokens, start, n_valid, eos):
            row_sel = jax.lax.dynamic_slice(logits, (n_valid - 1, 0), (1, logits.shape[1]))[0]
            return emit_token(row_sel, tokens, start, n_valid, eos)

        self._prefill_cache = {}
        self._prefill_draft_cache = {}
        self._emit_jit = jax.jit(emit_fn, donate_argnums=(1,))

        def get_prefill(bucket, emit):
            k = (bucket, emit)
            if k not in self._prefill_cache:
                self._prefill_cache[k] = jax.jit(
                    functools.partial(chunk_fn, bucket=bucket, emit=emit),
                    donate_argnums=(2, 3, 4))
            return self._prefill_cache[k]

        def get_prefill_draft(bucket):
            if bucket not in self._prefill_draft_cache:
                self._prefill_draft_cache[bucket] = jax.jit(
                    functools.partial(chunk_draft_only_fn, bucket=bucket),
                    donate_argnums=(1,))
            return self._prefill_draft_cache[bucket]

        def prepare_chunk_fn(tokens, start, *, bucket):
            ids = jax.lax.dynamic_slice(tokens, (start,), (bucket,))
            pos = start + jax.lax.iota(jnp.int32, bucket)
            mask = causal_mask_rows(start, bucket, L)
            return ids, pos, mask

        self._prepare_cache = {}

        def prepare_chunk(bucket):
            if bucket not in self._prepare_cache:
                self._prepare_cache[bucket] = jax.jit(
                    functools.partial(prepare_chunk_fn, bucket=bucket))
            return self._prepare_cache[bucket]

        self._get_prefill = get_prefill
        self._get_prefill_draft = get_prefill_draft
        self._prepare_chunk = prepare_chunk
        self._prefill_fused = t_fused

    def _run_prefix(self, start: int, n_valid: int):
        """Forward tokens[start : start+n_valid] through both models in static-shape
        chunks, emitting the next token at tokens[start+n_valid]
        (ref static:143-177 — prefill fills BOTH KV caches then argmaxes target)."""
        pd, pt = self.draft_model.params, self.target_model.params
        next_tok = None
        if self._prefill_fused:
            off = 0
            while off < n_valid:
                rem = n_valid - off
                bucket = PREFILL_CHUNK if rem > PREFILL_CHUNK \
                    else next_bucket(rem, PREFILL_BUCKETS)
                bucket = self._clamp_bucket(start + off, bucket)
                emit = rem <= bucket
                fn = self._get_prefill(bucket, emit)
                self.tokens, self.kv_draft, self.kv_target, nt = fn(
                    pd, pt, self.kv_draft, self.kv_target, self.tokens,
                    jnp.int32(start + off),
                    jnp.int32(rem if emit else bucket), self._eos_arr)
                if emit:
                    next_tok = nt
                off += min(rem, bucket)
        else:
            # offload target: draft chunks jitted; target layer-streamed. Slices are
            # prepared in a jit (never eagerly — see CLAUDE.md runtime rules).
            off = 0
            last_logits, last_off = None, 0
            while off < n_valid:
                rem = n_valid - off
                bucket = PREFILL_CHUNK if rem > PREFILL_CHUNK else next_bucket(rem, PREFILL_BUCKETS)
                bucket = self._clamp_bucket(start + off, bucket)
                self.kv_draft = self._get_prefill_draft(bucket)(
                    pd, self.kv_draft, self.tokens, jnp.int32(start + off))
                ids, pos, mask = self._prepare_chunk(bucket)(
                    self.tokens, jnp.int32(start + off))
                last_logits, self.kv_target = self.target_model.streamed_forward(
                    self.kv_target, ids, pos, mask, jnp.int32(start + off))
                last_off = off
                off += min(rem, bucket)
            self.tokens, next_tok = self._emit_jit(
                last_logits, self.tokens, jnp.int32(start + last_off),
                jnp.int32(n_valid - last_off), self._eos_arr)
        return next_tok

    def prefill(self, text: str):
        ids = self.tokenizer.encode(text)
        return self._prefill(np.asarray(ids, np.int32))

    def append(self, text: str):
        ids = self.tokenizer.encode(text)
        return self._append(np.asarray(ids[1:], np.int32))

    def _prefill(self, input_ids) -> bool:
        input_ids = np.asarray(input_ids, np.int32).reshape(-1)
        prefix_len = len(input_ids)
        if prefix_len >= self.max_length - 2 * self.safe_buffer:
            return False
        self.tokens_host[:prefix_len] = input_ids
        self.tokens = jnp.asarray(self.tokens_host)
        next_tok = self._run_prefix(0, prefix_len)
        self.num_nodes = prefix_len
        self.tokens_host[prefix_len] = int(next_tok)
        return True

    def _append(self, input_ids) -> bool:
        input_ids = np.asarray(input_ids, np.int32).reshape(-1)
        append_len = len(input_ids)
        if append_len + self.num_nodes >= self.max_length - 2 * self.safe_buffer:
            return False
        start = self.num_nodes
        # tokens[start] already holds last iteration's trailing token (ref :183-185)
        self.tokens_host[start + 1 : start + 1 + append_len] = input_ids
        self.tokens = jnp.asarray(self.tokens_host)
        n_valid = append_len + 1
        next_tok = self._run_prefix(start, n_valid)
        self.num_nodes = start + n_valid
        self.tokens_host[self.num_nodes] = int(next_tok)
        return True

    # ------------------------------------------------------------ host helpers

    def _commit_verify_result(self, out) -> bool:
        """Unpack a verify_tail result tuple, sync host state, return continue flag."""
        (self.tokens, self.kv_target, self.kv_draft,
         _num_nodes_new, accept_len, eos_found, block) = out
        accept_len = int(accept_len)
        block = np.asarray(block)
        old = self.num_nodes
        self.num_nodes = old + accept_len
        end = min(old + len(block), self.max_length)
        self.tokens_host[old:end] = block[: end - old]
        return not bool(eos_found)

    def _decode_words(self, generated_ids):
        if self.tokenizer is None:
            return [str(t) for t in generated_ids] or [""]
        return (self.tokenizer.decode(
            generated_ids, skip_special_tokens=True,
            clean_up_tokenization_spaces=False).strip().split(" "))

    def validate_status(self) -> bool:
        return self.num_nodes <= (self.max_length - self.safe_buffer)

    def _clamp_bucket(self, chunk_start: int, bucket: int) -> int:
        """Shrink a padded prefill bucket that would extend past max_length:
        dynamic slices CLAMP out-of-range starts, which would silently shift
        the window onto (and overwrite) already-committed tokens/KV."""
        while chunk_start + bucket > self.max_length and bucket > PREFILL_BUCKETS[0]:
            bucket = PREFILL_BUCKETS[PREFILL_BUCKETS.index(bucket) - 1]
        assert chunk_start + bucket <= self.max_length, \
            "prefill chunk exceeds the cache (overflow guard should prevent this)"
        return bucket

    def update_generation_args(self, **generation_args):
        self.temperature = generation_args.pop("temperature", self.temperature)
        self.topp = generation_args.pop("topp", self.topp)
        self.repetition_penalty = generation_args.pop("repetition_penalty", self.repetition_penalty)
        self.topk = generation_args.pop("topk", self.topk)

    def reset(self):
        self.num_nodes = 0
        self.tokens_host[:] = 0
        self.tokens = jnp.zeros(self.max_length, jnp.int32)
        self.kv_draft = self.draft_model.init_kv(kv_dtype=self.kv_dtype)
        self.kv_target = self.target_model.init_kv(kv_dtype=self.kv_dtype)

    # ------------------------------------------------------------ decode loops

    # streamed decode advances in fused segments of this many tokens (one dispatch
    # + one host sync per segment) when the fused loop is available
    stream_segment = 32

    def _decode_segments(self, max_new_tokens: int, on_progress):
        """Shared streaming loop body. Calls on_progress(generated_ids, elapsed,
        steps) after every commit; returns (dec_len, elapsed, steps)."""
        jax.block_until_ready(self.tokens)
        t1 = time.time()
        large_model_step = 0
        decode = True
        start = self.num_nodes
        generated_ids = []
        fused = self._can_decode_fused()
        if not fused and getattr(self, "_offload_step", None) is not None:
            # pipelined offload loop: per-commit callback does the streaming/stop
            # bookkeeping while the next step is already in flight on device
            state = {"steps": 0}

            def host_stop(alen):
                state["steps"] += 1
                begin = self.num_nodes - alen
                generated_ids.extend(self.tokens_host[begin : self.num_nodes].tolist())
                last_words = on_progress(generated_ids, time.time() - t1, state["steps"])
                return (is_sentence_complete_regex(last_words)
                        and (self.num_nodes - start >= max_new_tokens - self.stop_distance)) \
                    or (self.num_nodes - start >= max_new_tokens)

            large_model_step = self._decode_offload_pipelined(max_new_tokens, host_stop)
            jax.block_until_ready(self.tokens)
            return self.num_nodes - start + 1, time.time() - t1, large_model_step
        while decode and self.validate_status():
            begin = self.num_nodes
            if fused:
                seg = min(self.stream_segment,
                          max(max_new_tokens - (self.num_nodes - start), 1))
                large_model_step += self._decode_fused(seg)
                decode = not self._last_eos_stop
            else:
                self.build_tree()
                decode = self.verify()
                large_model_step += 1
            generated_ids.extend(self.tokens_host[begin : self.num_nodes].tolist())
            last_words = on_progress(generated_ids, time.time() - t1, large_model_step)
            if (is_sentence_complete_regex(last_words)
                    and (self.num_nodes - start >= max_new_tokens - self.stop_distance)) \
                    or (self.num_nodes - start >= max_new_tokens):
                decode = False
        jax.block_until_ready(self.tokens)
        return self.num_nodes - start + 1, time.time() - t1, large_model_step

    def speculative_decoding(self, max_new_tokens: int = 128):
        max_new_tokens = max(max_new_tokens, self.stop_distance)
        state = {"pos": 0, "words": [""]}

        def on_progress(generated_ids, elapsed, steps):
            words = self._decode_words(generated_ids)
            state["words"] = words
            now = len(words) - 1
            if now > state["pos"]:
                print(" ".join(words[state["pos"]:now]), end=" ", flush=True)
                state["pos"] = now
            return words[-1]

        dec_len, elapsed, large_model_step = self._decode_segments(
            max_new_tokens, on_progress)
        print(" ".join(state["words"][state["pos"]:]), flush=True)
        logger.info(TextColors.colorize(
            "Avg Accept Tokens {:.2f} | TPOT {:.2f} ms ".format(
                dec_len / max(large_model_step, 1), 1000 * elapsed / dec_len), "magenta"))
        return dec_len, elapsed, large_model_step

    def _start_request(self, api_args):
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

    def _can_decode_fused(self) -> bool:
        return (getattr(self, "_get_decode_loop", None) is not None
                and getattr(self, "_fused_target", False)
                and self.draft_model.supports_fused_phases)

    def _decode_fused(self, max_new_tokens: int):
        """Run the whole decode loop in ONE dispatch; sync host state once at the end.
        Returns large_model_steps; sets self._last_eos_stop."""
        greedy = self.temperature < 0.05
        use_pen = abs(self.repetition_penalty - 1.0) > 0.01
        self._key, sub = jax.random.split(self._key)
        fn = self._get_decode_loop(greedy, self.topk, use_pen)
        out = fn(self.draft_model.params, self.target_model.params,
                 self.kv_draft, self.kv_target, self.tokens,
                 jnp.int32(self.num_nodes), sub, jnp.int32(max_new_tokens),
                 jnp.float32(max(self.temperature, 1e-3)), jnp.float32(self.topp),
                 jnp.float32(self.repetition_penalty), self._consts)
        self.tokens, self.kv_draft, self.kv_target, stats = out
        jax.block_until_ready(self.tokens)
        stats_np = np.asarray(stats)
        self.num_nodes = int(stats_np[0])
        self._last_eos_stop = bool(stats_np[2])
        self.tokens_host[:] = np.asarray(self.tokens)
        return max(int(stats_np[1]), 1)

    def _decode_offload_pipelined(self, max_new_tokens: int, host_stop=None) -> int:
        """Decode loop for layer-streamed (offload) targets with DEVICE-RESIDENT
        num_nodes/cont state: Python runs one step ahead of the TPU, so step k+1's
        host->HBM layer streams and dispatches overlap step k's tail compute. One
        small download (accept_len, block, cont) per step, always one step behind
        the dispatch frontier — the host never stalls the stream pipeline.

        The in-flight step after a stop is a gated no-op on device (see the
        engines' gated_tail_fn), so host and device state stay consistent.
        host_stop(committed_new_tokens) may return True to stop early (streaming
        regex stop); returns committed large-model step count.
        """
        start = self.num_nodes
        nn = jnp.int32(start)
        cont = jnp.bool_(True)
        start_dev = jnp.int32(start)
        max_new_dev = jnp.int32(max_new_tokens)
        pending = None
        steps = 0
        while True:
            nn, cont, alen, block = self._offload_step(nn, cont, start_dev, max_new_dev)
            if pending is not None:
                steps += 1
                if self._commit_pending(pending, host_stop):
                    return steps
            pending = (alen, block, cont)

    def _commit_pending(self, pending, host_stop) -> bool:
        """Download one completed step's (accept_len, block, cont); sync host token
        state. Returns True when decoding should stop."""
        alen_dev, block_dev, cont_dev = pending
        alen = int(alen_dev)  # blocks until that step (not the in-flight one) is done
        block = np.asarray(block_dev)
        cont = bool(cont_dev)
        old = self.num_nodes
        self.num_nodes = old + alen
        end = min(old + len(block), self.max_length)
        self.tokens_host[old:end] = block[: end - old]
        self._last_eos_stop = not cont
        if host_stop is not None and host_stop(alen):
            return True
        return not cont

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
        if self._can_decode_fused():
            large_model_step = self._decode_fused(max_new_tokens)
        elif getattr(self, "_offload_step", None) is not None:
            large_model_step = self._decode_offload_pipelined(max_new_tokens)
        else:
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
        fused = self._can_decode_fused()
        while decode and self.validate_status():
            begin = self.num_nodes
            if fused:
                seg = min(self.stream_segment,
                          max(max_new_tokens - (self.num_nodes - start), 1))
                large_model_step += self._decode_fused(seg)
                decode = not self._last_eos_stop
            else:
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
