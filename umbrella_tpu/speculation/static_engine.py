"""Static-tree speculation engine (Sequoia growmap trees).

Behavioral counterpart of the reference's `StaticSpeculationEngine`
(`umbrella/speculation/static_speculation_engine.py`), re-architected for XLA:

- The ENTIRE tree build (all draft levels + expansion sampling) is ONE jitted
  computation with each level's exact static shapes unrolled — replacing the
  reference's per-level CUDA-graph replays + graphed samplers (ref :257-281,
  spec_utils:222-257). One dispatch instead of ~2*depth.
- Verify (target forward over the tree, repetition penalty, sampling, accept rule,
  bonus token, EOS scan, KV compaction of BOTH caches) is ONE jitted computation
  (ref :283-351 spread over many launches). For offloaded targets the layer-streamed
  forward runs outside jit and only the tail is fused.
- No persistent O(L^2) masks; each phase computes its own rows (ops/masks.py).
- KV buffers and the token buffer are donated — XLA updates them in place.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.masks import tree_level_mask_rows, tree_mask_rows
from ..utils import TextColors, setup_logger
from .engine_common import SpecEngineBase
from .tree import GrowMap
from .verify import verify_tail

logger = setup_logger()


class StaticEngine(SpecEngineBase):
    def __init__(self, draft_model_name, target_model_name, dtype=jnp.bfloat16,
                 device=None, **kwargs) -> None:
        growmap_path = kwargs.pop("growmap_path", None)
        growmap_obj = kwargs.pop("growmap", None)
        assert growmap_path is not None or growmap_obj is not None, (
            "Please specify growmap path (or growmap object) for static trees")
        super().__init__(draft_model_name, target_model_name, dtype, device, **kwargs)
        self.growmap_path = growmap_path
        self.growmap_obj = growmap_obj

    def initialize(self):
        if self.growmap_obj is not None:
            gm = self.growmap_obj if isinstance(self.growmap_obj, GrowMap) \
                else GrowMap.from_dict(self.growmap_obj)
        else:
            gm = GrowMap.from_json(self.growmap_path)
        gm.validate()
        self.growmap = gm
        self.tree_size = gm.size
        self.tree_depth = gm.num_levels
        # The verify block writes [num_nodes, num_nodes + tree_size + 1); if the
        # stop margin were smaller than a tree, dynamic_update_slice would CLAMP
        # the start near the cap and silently overwrite committed tokens.
        self.safe_buffer = max(self.safe_buffer, self.tree_size + 1)
        logger.info(TextColors.colorize(
            f"Tree Size {self.tree_size - 1} | Tree Depth {self.tree_depth - 1}", "magenta"))

        self._init_models_and_state()
        self._build_tree_phases()

    # -------------------------------------------------------------- jitted phases

    def _build_tree_phases(self):
        # NOTE: every device-array constant (bitmap, depth vectors, gather indices,
        # eos ids) is passed INTO the jitted phases as an argument pytree — embedding
        # them as closure constants poisons this runtime's dispatch path permanently
        # (see ops/select.py).
        gm = self.growmap
        L = self.max_length
        d_fwd = self.draft_model.forward
        t_fused = self.target_model.supports_fused_phases
        t_fwd = self.target_model.forward if t_fused else None
        tree_size = gm.size

        level_static = []  # python ints only — safe to close over
        level_arrays = []  # device constants — passed as args
        for lvl in range(gm.num_levels):
            level_static.append(dict(
                start=gm.level_start(lvl),
                n=len(gm.roots[lvl]),
                topk=gm.level_topk(lvl) if lvl < gm.num_levels - 1 else 0,
            ))
            level_arrays.append(dict(
                depth=jnp.asarray(gm.depth[gm.level_nodes(lvl)], jnp.int32),
                gather=(jnp.asarray(gm.level_gather_indices(lvl))
                        if lvl < gm.num_levels - 1 else jnp.zeros(0, jnp.int32)),
            ))

        self._consts = dict(
            bitmap=jnp.asarray(gm.bitmap),
            depth=jnp.asarray(gm.depth, jnp.int32),
            parents=jnp.asarray(gm.parents, jnp.int32),
            node_in_path=jnp.asarray(gm.node_in_path, jnp.int32),
            eos=self._eos_arr,
            levels=tuple(level_arrays),
        )

        recall = self.draft_topk_recall

        # BUILD-PHASE COST MODEL (v5e, 2026-08, slope-measured at the 8B bench
        # config: 12-layer 500M-shape W4 draft, 24x6 tree, L=2048). Full build
        # = 7.58 ms. Decomposition: draft_topk over [n,128k] + per-level mask
        # rows + expansion gathers/writes together measure AT NOISE (<=0.03 ms
        # — the round-2 "~2 ms unexplained misc" was floor-accounting error,
        # not hidden work). The build is 5 sequential level forwards, each
        # ~1.2 ms and S-INDEPENDENT (S=2..24 all pad to one MXU tile), each
        # decomposing as 12 layers x ~80 us + 254 us W4 lm_head, where a layer
        # is a DEPENDENCY CHAIN of 4 W4A16 kernel calls (qkv->attn->wo,
        # gate_up->down; 40 us chained vs ~8-10 us per isolated call), the
        # flash-attention call (22 us), and rope/KV-write/norms (~18 us). So
        # the phase is kernel-LATENCY bound on a serial chain — not HBM, not
        # sampling logic: cutting it requires fewer levels (tree shape), fewer
        # layers (draft choice), or fusing the per-layer matmul chain into one
        # kernel; nothing host- or glue-side is left to shave.
        # Deferred-leaf build: the LAST level's forward exists only to write draft
        # KV for its 24-odd leaves, of which at most ONE (the accepted leaf) is
        # ever read — and only on the NEXT step. So the leaf forward is dropped
        # and level 0 widens to the last TWO committed slots [nn-1, nn] with a
        # causal mask: slot nn-1 is either an already-drafted node (recompute is
        # bit-identical — same token, position, and visible prefix) or the
        # accepted leaf whose KV was skipped; slot nn is the root/bonus token,
        # which never had draft KV (same reason this always worked for the bonus
        # token). One whole draft forward (~0.7 ms at 500M-draft shapes, latency-
        # bound regardless of level width) is saved per step.
        defer_leaf = gm.num_levels >= 2
        n_levels = gm.num_levels

        def build_tree_fn(pd, kv_d, tokens, num_nodes, consts):
            from ..ops.masks import causal_mask_rows

            bitmap = consts["bitmap"]
            for lvl, (ms, ma) in enumerate(zip(level_static, consts["levels"])):
                if defer_leaf and lvl == n_levels - 1:
                    continue  # leaf KV deferred to the next step's level 0
                if defer_leaf and lvl == 0:
                    ids = jax.lax.dynamic_slice(tokens, (num_nodes - 1,), (2,))
                    pos = num_nodes - 1 + jax.lax.iota(jnp.int32, 2)
                    mask = causal_mask_rows(num_nodes - 1, 2, L)
                    logits, kv_d = d_fwd(pd, kv_d, ids, pos, mask, num_nodes - 1)
                    logits = logits[1:2]  # expansion samples from the root row
                else:
                    ids = jax.lax.dynamic_slice(
                        tokens, (num_nodes + ms["start"],), (ms["n"],))
                    pos = num_nodes + ma["depth"]
                    mask = tree_level_mask_rows(num_nodes, bitmap, ms["start"], ms["n"], L)
                    logits, kv_d = d_fwd(pd, kv_d, ids, pos, mask, num_nodes + ms["start"])
                if ms["topk"] > 0:
                    from ..ops.sampling import draft_topk
                    from ..ops.select import take_vec

                    cand = draft_topk(logits, ms["topk"], recall)[1].reshape(-1)
                    new_tokens = take_vec(cand, ma["gather"]).astype(jnp.int32)
                    tokens = jax.lax.dynamic_update_slice(
                        tokens, new_tokens, (num_nodes + ms["start"] + ms["n"],))
            return tokens, kv_d

        self._build_tree_jit = jax.jit(build_tree_fn, donate_argnums=(1, 2))

        def verify_fn(pt, kv_t, kv_d, tokens, num_nodes, key, temperature, topp, penalty,
                      consts, *, greedy, topk, use_pen):
            ids = jax.lax.dynamic_slice(tokens, (num_nodes,), (tree_size,))
            pos = num_nodes + consts["depth"]
            mask = tree_mask_rows(num_nodes, consts["bitmap"], L)
            logits, kv_t = t_fwd(pt, kv_t, ids, pos, mask, num_nodes)
            return verify_tail(logits, kv_t, kv_d, tokens, num_nodes, key,
                               temperature, topp, penalty, consts["bitmap"],
                               consts["parents"], consts["node_in_path"], consts["eos"],
                               tree_size=tree_size,
                               greedy=greedy, topk=topk, use_pen=use_pen)

        def tail_fn(logits, kv_t, kv_d, tokens, num_nodes, key, temperature, topp, penalty,
                    consts, *, greedy, topk, use_pen):
            return verify_tail(logits, kv_t, kv_d, tokens, num_nodes, key,
                               temperature, topp, penalty, consts["bitmap"],
                               consts["parents"], consts["node_in_path"], consts["eos"],
                               tree_size=tree_size,
                               greedy=greedy, topk=topk, use_pen=use_pen)

        self._verify_cache = {}
        self._fused_target = t_fused

        def get_verify(greedy, topk, use_pen):
            k = (greedy, topk, use_pen)
            if k not in self._verify_cache:
                fn = verify_fn if t_fused else tail_fn
                self._verify_cache[k] = jax.jit(
                    functools.partial(fn, greedy=greedy, topk=topk, use_pen=use_pen),
                    donate_argnums=(1, 2, 3))
            return self._verify_cache[k]

        self._get_verify = get_verify

        def prepare_verify_fn(tokens, num_nodes, consts):
            ids = jax.lax.dynamic_slice(tokens, (num_nodes,), (tree_size,))
            pos = num_nodes + consts["depth"]
            mask = tree_mask_rows(num_nodes, consts["bitmap"], L)
            return ids, pos, mask

        self._prepare_verify = jax.jit(prepare_verify_fn)

        # ---- gated verify tail for the pipelined offload loop -------------------
        # Same math as tail_fn but the commit is gated on a device-resident `cont`
        # flag and the stop condition (EOS | token budget | context cap) is folded
        # in. This keeps num_nodes/accept state on device so the host never syncs
        # between steps — Python dispatches step k+1's layer streams while the TPU
        # still runs step k (see engine_common._decode_offload_pipelined).
        cap_gate = self.max_length - self.safe_buffer

        def gated_tail_fn(logits, kv_t, kv_d, tokens, num_nodes, cont, start, max_new,
                          key, temperature, topp, penalty, consts,
                          *, greedy, topk, use_pen):
            (tokens, kv_t, kv_d, nn_new, alen, eos_found, block) = verify_tail(
                logits, kv_t, kv_d, tokens, num_nodes, key, temperature, topp,
                penalty, consts["bitmap"], consts["parents"],
                consts["node_in_path"], consts["eos"], tree_size=tree_size,
                greedy=greedy, topk=topk, use_pen=use_pen)
            # When cont is False this step is a no-op: verify_tail only touches the
            # scratch region >= num_nodes (block[0] always equals the preserved root
            # token), so refusing to advance num_nodes discards it entirely.
            nn_out = jnp.where(cont, nn_new, num_nodes)
            alen_out = jnp.where(cont, alen, 0)
            cont_out = (cont & ~eos_found & ((nn_out - start) < max_new)
                        & (nn_out <= cap_gate))
            return tokens, kv_t, kv_d, nn_out, cont_out, alen_out, block

        self._gated_tail_cache = {}

        def get_gated_tail(greedy, topk, use_pen):
            k = (greedy, topk, use_pen)
            if k not in self._gated_tail_cache:
                self._gated_tail_cache[k] = jax.jit(
                    functools.partial(gated_tail_fn, greedy=greedy, topk=topk,
                                      use_pen=use_pen),
                    donate_argnums=(1, 2, 3))
            return self._gated_tail_cache[k]

        self._get_gated_tail = get_gated_tail

        # ---- fully fused decode loop: ONE dispatch per request ------------------
        # On this runtime any per-step host sync permanently degrades dispatch to
        # ~25ms (see CLAUDE.md), and even on a healthy runtime one dispatch per
        # request beats 2*steps dispatches. The whole build+verify loop runs inside
        # lax.while_loop; only the final token buffer is downloaded.
        cap = self.max_length - self.safe_buffer

        def decode_loop_fn(pd, pt, kv_d, kv_t, tokens, num_nodes, key, max_new,
                           temperature, topp, penalty, consts,
                           *, greedy, topk, use_pen):
            start = num_nodes

            def cond(state):
                tokens, kv_d, kv_t, num_nodes, key, steps, cont = state
                return cont & ((num_nodes - start) < max_new) & (num_nodes <= cap)

            def body(state):
                tokens, kv_d, kv_t, num_nodes, key, steps, cont = state
                tokens, kv_d = build_tree_fn(pd, kv_d, tokens, num_nodes, consts)
                key, sub = jax.random.split(key)
                ids = jax.lax.dynamic_slice(tokens, (num_nodes,), (tree_size,))
                pos = num_nodes + consts["depth"]
                mask = tree_mask_rows(num_nodes, consts["bitmap"], L)
                logits, kv_t = t_fwd(pt, kv_t, ids, pos, mask, num_nodes)
                (tokens, kv_t, kv_d, num_nodes, _accept_len, eos_found, _block) = verify_tail(
                    logits, kv_t, kv_d, tokens, num_nodes, sub,
                    temperature, topp, penalty, consts["bitmap"], consts["parents"],
                    consts["node_in_path"], consts["eos"], tree_size=tree_size,
                    greedy=greedy, topk=topk, use_pen=use_pen)
                return (tokens, kv_d, kv_t, num_nodes, key, steps + 1, ~eos_found)

            init = (tokens, kv_d, kv_t, num_nodes, key, jnp.int32(0), jnp.bool_(True))
            tokens, kv_d, kv_t, num_nodes, key, steps, cont = jax.lax.while_loop(
                cond, body, init)
            stats = jnp.stack([num_nodes, steps, (~cont).astype(jnp.int32)])
            return tokens, kv_d, kv_t, stats

        self._decode_loop_cache = {}

        def get_decode_loop(greedy, topk, use_pen):
            k = (greedy, topk, use_pen)
            if k not in self._decode_loop_cache:
                self._decode_loop_cache[k] = jax.jit(
                    functools.partial(decode_loop_fn, greedy=greedy, topk=topk,
                                      use_pen=use_pen),
                    donate_argnums=(2, 3, 4))
            return self._decode_loop_cache[k]

        self._get_decode_loop = get_decode_loop

    # -------------------------------------------------------------- decode phases

    def build_tree(self):
        self.tokens, self.kv_draft = self._build_tree_jit(
            self.draft_model.params, self.kv_draft, self.tokens,
            jnp.int32(self.num_nodes), self._consts)

    def _offload_step(self, nn, cont, start, max_new):
        """One fully device-resident build+stream+verify step (offload targets).
        Returns (nn', cont', accept_len, block) as device values — no host sync."""
        greedy = self.temperature < 0.05
        use_pen = abs(self.repetition_penalty - 1.0) > 0.01
        self._key, sub = jax.random.split(self._key)
        self.tokens, self.kv_draft = self._build_tree_jit(
            self.draft_model.params, self.kv_draft, self.tokens, nn, self._consts)
        ids, pos, mask = self._prepare_verify(self.tokens, nn, self._consts)
        logits, self.kv_target = self.target_model.streamed_forward(
            self.kv_target, ids, pos, mask, nn)
        fn = self._get_gated_tail(greedy, self.topk, use_pen)
        (self.tokens, self.kv_target, self.kv_draft, nn, cont, alen, block) = fn(
            logits, self.kv_target, self.kv_draft, self.tokens, nn, cont, start,
            max_new, sub, jnp.float32(max(self.temperature, 1e-3)),
            jnp.float32(self.topp), jnp.float32(self.repetition_penalty),
            self._consts)
        return nn, cont, alen, block

    def verify(self) -> bool:
        greedy = self.temperature < 0.05
        use_pen = abs(self.repetition_penalty - 1.0) > 0.01
        self._key, sub = jax.random.split(self._key)
        num_nodes = jnp.int32(self.num_nodes)
        fn = self._get_verify(greedy, self.topk, use_pen)
        common = (num_nodes, sub, jnp.float32(max(self.temperature, 1e-3)),
                  jnp.float32(self.topp), jnp.float32(self.repetition_penalty),
                  self._consts)
        if self._fused_target:
            out = fn(self.target_model.params, self.kv_target, self.kv_draft,
                     self.tokens, *common)
        else:
            ids, pos, mask = self._prepare_verify(self.tokens, num_nodes, self._consts)
            logits, self.kv_target = self.target_model.streamed_forward(
                self.kv_target, ids, pos, mask, num_nodes)
            out = fn(logits, self.kv_target, self.kv_draft, self.tokens, *common)
        return self._commit_verify_result(out)
