"""Dynamic beam-tree speculation engine.

Behavioral counterpart of the reference's `DynamicSpeculationEngine`
(`umbrella/speculation/dynamic_speculation_engine.py`): the tree is grown online,
level by level, keeping the global top-`width` children (of `num_beams` candidates per
frontier node) scored by cumulative draft log-probability (ref :216-248). The verify
phase is the same token-match accept rule, with the ancestor bitmap built during
expansion instead of read from a growmap.

TPU re-design: the whole expansion — depth+1 draft forwards, per-level beam scoring,
parent bookkeeping, and bitmap row construction — is ONE jitted computation (static
shapes: width/depth/num_beams are engine constants). The reference runs ~2*depth
kernel launches plus Python mask row copies per iteration; here it's one dispatch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.masks import tree_level_mask_rows, tree_mask_rows
from ..utils import TextColors, setup_logger
from .engine_common import SpecEngineBase
from .verify import verify_tail

logger = setup_logger()


class DynamicEngine(SpecEngineBase):
    ban_eos_at_prefill = True  # ref dynamic:130 bans EOS as the first generated token

    def __init__(self, draft_model_name, target_model_name, dtype=jnp.bfloat16,
                 device=None, **kwargs) -> None:
        num_beams = kwargs.pop("num_beams", 24)
        width = kwargs.pop("width", 16)
        depth = kwargs.pop("depth", 24)
        super().__init__(draft_model_name, target_model_name, dtype, device, **kwargs)
        self.num_beams = num_beams
        self.tree_width = width
        self.tree_depth = depth
        self.tree_size = width * depth + 1

    def initialize(self):
        # Stop margin must cover a whole tree write (see static_engine.initialize).
        self.safe_buffer = max(self.safe_buffer, self.tree_size + 1)
        logger.info(TextColors.colorize(
            "Tree Size {} | Tree Depth {} | Tree Width {}".format(
                self.tree_size - 1, self.tree_depth, self.tree_width), "magenta"))
        self._init_models_and_state()
        self._build_tree_phases()
        # bitmap/parents produced by the last build_tree, consumed by verify
        self._tree_bitmap = jnp.eye(self.tree_size, dtype=bool)
        self._tree_parents = jnp.zeros(self.tree_size, jnp.int32)

    # -------------------------------------------------------------- jitted phases

    def _build_tree_phases(self):
        W, D, B = self.tree_width, self.tree_depth, self.num_beams
        tree_size = self.tree_size
        L = self.max_length
        d_fwd = self.draft_model.forward
        t_fused = self.target_model.supports_fused_phases
        t_fwd = self.target_model.forward if t_fused else None
        eos_arr = self._eos_arr
        recall = self.draft_topk_recall

        # node depth vector: [0, 1*W ones, 2*W ones, ...] (ref :65-68)
        # All device-array constants go into self._consts and are passed INTO the
        # jitted phases as arguments — closure constants poison this runtime's
        # dispatch path (see ops/select.py).
        depth_all = np.zeros(tree_size, np.int32)
        for i in range(D):
            depth_all[1 + i * W : 1 + (i + 1) * W] = i + 1
        self._consts = dict(
            depth=jnp.asarray(depth_all),
            node_in_path=jnp.asarray(depth_all + 1),
            eos=self._eos_arr,
        )

        def build_tree_fn(pd, kv_d, tokens, num_nodes, consts):
            from ..ops.masks import causal_mask_rows

            ri = jax.lax.broadcasted_iota(jnp.int32, (tree_size, tree_size), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (tree_size, tree_size), 1)
            bitmap = ri == ci
            parents = jnp.zeros(tree_size, jnp.int32)
            tree_score = jnp.zeros(tree_size, jnp.float32)
            lvl_start = 0
            # Deferred-leaf build (see static_engine._build_tree_phases): the
            # last level's forward only writes leaf KV; drop it and let level 0
            # recompute the (at most one) accepted leaf's KV next step by
            # widening to the last TWO committed slots with a causal mask.
            for step in range(D):
                if step == 0:
                    dec_len = 1
                    ids = jax.lax.dynamic_slice(tokens, (num_nodes - 1,), (2,))
                    pos = num_nodes - 1 + jax.lax.iota(jnp.int32, 2)
                    mask = causal_mask_rows(num_nodes - 1, 2, L)
                    logits, kv_d = d_fwd(pd, kv_d, ids, pos, mask, num_nodes - 1)
                    logits = logits[1:2]  # expansion scores from the root row
                else:
                    dec_len = W
                    ids = jax.lax.dynamic_slice(
                        tokens, (num_nodes + lvl_start,), (dec_len,))
                    pos = num_nodes + step + jnp.zeros((dec_len,), jnp.int32)
                    mask = tree_level_mask_rows(num_nodes, bitmap, lvl_start, dec_len, L)
                    logits, kv_d = d_fwd(pd, kv_d, ids, pos, mask, num_nodes + lvl_start)
                from ..ops.sampling import draft_topk
                from ..ops.select import onehot, take_vec

                top_vals, top_idx = draft_topk(logits, B, recall)  # [dec_len, B]
                step_scores = jnp.log(jax.nn.softmax(top_vals, axis=-1) + 1e-4)
                hist = jax.lax.dynamic_slice(tree_score, (lvl_start,), (dec_len,))
                cand = (hist[:, None] + step_scores).reshape(-1)
                sel_score, sel = jax.lax.top_k(cand, W)
                new_tokens = take_vec(top_idx.reshape(-1), sel).astype(jnp.int32)
                parent_global = (lvl_start + sel // B).astype(jnp.int32)

                new_start = lvl_start + dec_len
                tokens = jax.lax.dynamic_update_slice(
                    tokens, new_tokens, (num_nodes + new_start,))
                tree_score = jax.lax.dynamic_update_slice(
                    tree_score, sel_score, (new_start,))
                parents = jax.lax.dynamic_update_slice(
                    parents, parent_global, (new_start,))
                self_rows_iota = jax.lax.broadcasted_iota(jnp.int32, (W, tree_size), 1)
                self_rows = self_rows_iota == (
                    new_start + jax.lax.iota(jnp.int32, W))[:, None]
                parent_rows = jnp.dot(
                    onehot(parent_global, tree_size, jnp.float32),
                    bitmap.astype(jnp.float32),
                    preferred_element_type=jnp.float32) > 0.5
                new_rows = parent_rows | self_rows
                bitmap = jax.lax.dynamic_update_slice(bitmap, new_rows, (new_start, 0))
                lvl_start = new_start
            return tokens, kv_d, bitmap, parents

        self._build_tree_jit = jax.jit(build_tree_fn, donate_argnums=(1, 2))

        def verify_fn(pt, kv_t, kv_d, tokens, bitmap, parents, num_nodes, key,
                      temperature, topp, penalty, consts, *, greedy, topk, use_pen):
            ids = jax.lax.dynamic_slice(tokens, (num_nodes,), (tree_size,))
            pos = num_nodes + consts["depth"]
            mask = tree_mask_rows(num_nodes, bitmap, L)
            logits, kv_t = t_fwd(pt, kv_t, ids, pos, mask, num_nodes)
            return verify_tail(logits, kv_t, kv_d, tokens, num_nodes, key,
                               temperature, topp, penalty, bitmap, parents,
                               consts["node_in_path"], consts["eos"], tree_size=tree_size,
                               greedy=greedy, topk=topk, use_pen=use_pen)

        def tail_fn(logits, kv_t, kv_d, tokens, bitmap, parents, num_nodes, key,
                    temperature, topp, penalty, consts, *, greedy, topk, use_pen):
            return verify_tail(logits, kv_t, kv_d, tokens, num_nodes, key,
                               temperature, topp, penalty, bitmap, parents,
                               consts["node_in_path"], consts["eos"], tree_size=tree_size,
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

        def prepare_verify_fn(tokens, bitmap, num_nodes, consts):
            ids = jax.lax.dynamic_slice(tokens, (num_nodes,), (tree_size,))
            pos = num_nodes + consts["depth"]
            mask = tree_mask_rows(num_nodes, bitmap, L)
            return ids, pos, mask

        self._prepare_verify = jax.jit(prepare_verify_fn)

        # gated verify tail for the pipelined offload loop (see static engine for
        # the no-op-when-~cont argument; dynamic trees additionally thread the
        # freshly built bitmap/parents through as traced values)
        cap_gate = self.max_length - self.safe_buffer

        def gated_tail_fn(logits, kv_t, kv_d, tokens, bitmap, parents, num_nodes,
                          cont, start, max_new, key, temperature, topp, penalty,
                          consts, *, greedy, topk, use_pen):
            (tokens, kv_t, kv_d, nn_new, alen, eos_found, block) = verify_tail(
                logits, kv_t, kv_d, tokens, num_nodes, key, temperature, topp,
                penalty, bitmap, parents, consts["node_in_path"], consts["eos"],
                tree_size=tree_size, greedy=greedy, topk=topk, use_pen=use_pen)
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

        # fully fused decode loop — one dispatch per request (see static engine)
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
                tokens, kv_d, bitmap, parents = build_tree_fn(
                    pd, kv_d, tokens, num_nodes, consts)
                key, sub = jax.random.split(key)
                ids = jax.lax.dynamic_slice(tokens, (num_nodes,), (tree_size,))
                pos = num_nodes + consts["depth"]
                mask = tree_mask_rows(num_nodes, bitmap, L)
                logits, kv_t = t_fwd(pt, kv_t, ids, pos, mask, num_nodes)
                (tokens, kv_t, kv_d, num_nodes, _alen, eos_found, _blk) = verify_tail(
                    logits, kv_t, kv_d, tokens, num_nodes, sub,
                    temperature, topp, penalty, bitmap, parents,
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
        (self.tokens, self.kv_draft, self._tree_bitmap,
         self._tree_parents) = self._build_tree_jit(
            self.draft_model.params, self.kv_draft, self.tokens,
            jnp.int32(self.num_nodes), self._consts)

    def _offload_step(self, nn, cont, start, max_new):
        """One fully device-resident build+stream+verify step (offload targets)."""
        greedy = self.temperature < 0.05
        use_pen = abs(self.repetition_penalty - 1.0) > 0.01
        self._key, sub = jax.random.split(self._key)
        (self.tokens, self.kv_draft, bitmap, parents) = self._build_tree_jit(
            self.draft_model.params, self.kv_draft, self.tokens, nn, self._consts)
        ids, pos, mask = self._prepare_verify(self.tokens, bitmap, nn, self._consts)
        logits, self.kv_target = self.target_model.streamed_forward(
            self.kv_target, ids, pos, mask, nn)
        fn = self._get_gated_tail(greedy, self.topk, use_pen)
        (self.tokens, self.kv_target, self.kv_draft, nn, cont, alen, block) = fn(
            logits, self.kv_target, self.kv_draft, self.tokens, bitmap, parents,
            nn, cont, start, max_new, sub,
            jnp.float32(max(self.temperature, 1e-3)), jnp.float32(self.topp),
            jnp.float32(self.repetition_penalty), self._consts)
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
                     self.tokens, self._tree_bitmap, self._tree_parents, *common)
        else:
            ids, pos, mask = self._prepare_verify(
                self.tokens, self._tree_bitmap, num_nodes, self._consts)
            logits, self.kv_target = self.target_model.streamed_forward(
                self.kv_target, ids, pos, mask, num_nodes)
            out = fn(logits, self.kv_target, self.kv_draft, self.tokens,
                     self._tree_bitmap, self._tree_parents, *common)
        return self._commit_verify_result(out)

    def reset(self):
        super().reset()
        self._tree_bitmap = jnp.eye(self.tree_size, dtype=bool)
        self._tree_parents = jnp.zeros(self.tree_size, jnp.int32)
