"""Continuous-batching TPU inference engine.

This replaces the reference's rented HTTP inference (SURVEY.md §0): the
asyncio fan-out that used to post chat completions to OpenRouter
(scripts/deep_search.py:1424-1721) instead submits to this engine, which
interleaves hundreds of multi-turn trajectories on-chip.

Design (TPU-first):

* **Fixed-shape decode.** One jitted ``decode_chunk`` runs every step over a
  static ``max_slots``-wide batch — inactive slots write to the null page
  and their samples are ignored. No recompiles, no dynamic shapes.
* **Multi-token decode.** ``lax.scan`` advances ``decode_chunk_len`` tokens
  per dispatch, amortizing host→device latency; stop scanning happens on the
  host afterwards and over-generated tokens are trimmed (their KV writes are
  masked out by ``seq_lens`` so the cache stays consistent).
* **Bucketed prefill.** Prompts are padded to power-of-two buckets so the
  prefill jit cache stays small.
* **Paged KV + prefix reuse.** Page tables come from ``PageAllocator``;
  completed turns are inserted into the radix :class:`PrefixCache` so a
  trajectory returning from a tool call (web I/O) re-prefills only its new
  suffix — the reference pays full prefill per turn at its providers.
* **Fused on-device sampling** (engine/sampling.py) with per-slot params.

Host↔engine contract is thread-safe: ``submit`` returns a
``concurrent.futures.Future``; the engine loop runs in a daemon thread.
"""
from __future__ import annotations

import queue
import sys
import threading
import time
import uuid
from concurrent.futures import Future
from dataclasses import dataclass, field
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.registry import get_model
from .kvcache import PageAllocator
from .sampling import SamplingParams, sample, update_seen
from .stopping import StopState


@dataclass
class GenerationRequest:
    prompt_ids: list[int]
    max_tokens: int = 256
    temperature: float = 0.7
    top_k: int = 20
    top_p: float = 0.8
    min_p: float = 0.05
    repetition_penalty: float = 1.05
    min_tokens: int = 0            # logit-level budget forcing: suppress EOS
    stop: tuple[str, ...] = ()
    include_stop_str: bool = False
    on_delta: Any = None           # optional callable(str) for token streaming
    request_id: str = field(default_factory=lambda: uuid.uuid4().hex[:16])


@dataclass
class GenerationResult:
    request_id: str
    token_ids: list[int]
    text: str
    finish_reason: str
    prompt_tokens: int
    completion_tokens: int
    cached_prompt_tokens: int = 0


class _Slot:
    """Host-side state for one active sequence."""

    def __init__(self, idx: int):
        self.idx = idx
        self.req: GenerationRequest | None = None
        self.future: Future | None = None
        self.pages: list[int] = []
        self.shared_pages: list[int] = []
        self.prompt_tokens: list[int] = []
        self.prompt_len = 0
        self.cached_len = 0
        self.generated: list[int] = []
        self.stop: StopState | None = None
        self.detok = None
        self.active = False
        self.epoch = 0   # bumped on reset: stale pipelined results are dropped

    def reset(self):
        self.epoch += 1
        self.req = None
        self.future = None
        self.pages = []
        self.shared_pages = []
        self.prompt_tokens = []
        self.prompt_len = 0
        self.cached_len = 0
        self.generated = []
        self.stop = None
        self.detok = None
        self.active = False


class Engine:
    def __init__(
        self,
        model_name: str,
        tokenizer,
        params: dict | None = None,
        *,
        mesh=None,
        rules=None,
        max_slots: int = 8,
        page_size: int = 16,
        n_pages: int = 512,
        max_seq_len: int = 1024,
        decode_chunk_len: int = 8,
        admit_batch: int | None = None,
        attn_impl: str | None = None,
        cache_mode: str = "paged",   # "paged" (prefix sharing) | "slot"
        quantize: str | None = None,  # "int8" quantizes matmul weights
        kv_quantize: str | None = None,  # "int8" KV pages + per-row scales
        pack_weights: bool | None = None,  # fuse QKV / gate+up (single-chip)
        layer_fusion: bool | None = None,  # Pallas fused decode-layer kernels
        #   None = auto: on for TPU single-chip bf16 dense serving (measured
        #   +2% decode and ~4x faster warmup vs the XLA layer chain)
        context_buckets: bool | str = "fine",  # slice decode page tables to
        #   the bucketed context need: "fine" (default) = pow2 + 1.5x
        #   midpoints, True = pow2 only, False = always the full budget.
        #   Measured on v5e (1.5B, B=64): fine 6470 vs pow2 6301 tok/s —
        #   the XLA gather reads the whole bucket per row, so midpoints cut
        #   tail-step padding at the cost of a few extra decode programs.
        pipeline_decode: bool = True,  # dispatch chunk N+1 before syncing N
        chunk_trim: bool = False,  # dispatch a HALF-length decode chunk when
        #   some row is within half a chunk of its known max_tokens
        #   completion, halving mid-chunk completion waste (a finished row
        #   rides the rest of the chunk inactive; slot_steps occupancy 0.76
        #   in the r4 agent capture). MEASURED-NEGATIVE opt-in on axon:
        #   the A/B (scripts/probe_trim.py, 8 interleaved agent rounds at
        #   B=96) shows occupancy 0.93 vs 0.76-0.87 exactly as designed,
        #   but decode 3760 vs 4286 and e2e 3114 vs 3348 — under steady
        #   churn every chunk trims (14/14), and the ~160ms fixed
        #   per-chunk cost through the tunnel (exposed dispatch RTT + host
        #   merge + in-window prefill) outweighs the waste saved — the
        #   same physics that made chunk-8 latency mode lose to chunk-32.
        #   On a local (non-tunneled) TPU runtime the fixed cost is ~100x
        #   smaller and this policy should win; re-measure there before
        #   enabling. Only engages at context buckets whose half-length
        #   program was precompiled by warmup(); excluded under
        #   speculation and the prefill lane.
        max_prefill_group: int | None = None,  # prefill rows per dispatch
        #   (padded to pow2; default 8 — larger groups amortize the per-
        #   dispatch fixed cost when bursts of same-bucket prompts arrive)
        ring_prefill_len: int | None = None,  # fresh prefills >= this length
        # run sequence-parallel attention over the mesh's tp axis (sp
        # aliases tp)
        sp_impl: str = "ring",  # long-prefill SP strategy: "ring" rotates
        #   K/V blocks over ICI (ops/ring_attention.py); "ulysses"
        #   re-partitions seq->heads with two all_to_alls (ops/ulysses.py)
        prefill_lane: int = 0,  # in-flight chunked prefill: ride this many
        #   prompt tokens on every decode step (Sarathi/vLLM-style chunked
        #   prefill, fused into the decode program so prompts stream through
        #   decode's HBM-bound weight reads). 0 = off; requests then prefill
        #   in dedicated batched dispatches. Lane admission only engages
        #   while decode rows are active — cold bursts still take the fast
        #   batched-prefill path.
        lane_max_act: int | None = None,  # lane prompts that may COMPLETE
        #   (sample their first token in-program) per decode chunk; default
        #   LANE_MAX_ACT. Size to the expected churn: completions per chunk
        #   ≈ max_slots * decode_chunk_len / mean_decode_len.
        speculative: str | None = None,  # "ngram": device n-gram drafting +
        #   K-token verify decode steps (engine/speculative.py). Decode is
        #   HBM-bound at serving batch, so a verify row's extra K tokens ride
        #   the same weight read — every accepted draft is a ~free token.
        #   Greedy outputs are bit-identical to sequential decode; sampled
        #   outputs are distribution-identical via exact-match acceptance.
        #   Requires the contiguous-slot cache (rejected-window KV rewinds by
        #   construction: the next window overwrites it before any read).
        spec_k: int = 3,       # draft tokens per verify step
        spec_ngram: int = 2,   # n-gram length for the draft lookup
        seed: int = 0,
        enable_prefix_cache: bool = True,
    ):
        fam = get_model(model_name)
        self.cfg = fam.config
        self.forward = fam.forward
        self.tokenizer = tokenizer
        self.mesh = mesh
        self.max_slots = max_slots
        self.page_size = page_size
        self.n_pages = n_pages
        self.max_seq_len = max_seq_len
        self.max_pages_per_seq = -(-max_seq_len // page_size)
        self.decode_chunk_len = decode_chunk_len
        if speculative is not None:
            if speculative != "ngram":
                raise ValueError(f"unknown speculative mode {speculative!r}")
            if cache_mode != "slot":
                raise ValueError(
                    "speculative decoding requires cache_mode='slot' (the "
                    "contiguous rows make rejected-window KV rewind free)")
            if kv_quantize:
                raise ValueError("speculative decoding excludes int8 KV")
            if prefill_lane:
                raise ValueError(
                    "speculative decoding and the prefill lane are mutually "
                    "exclusive decode-program variants")
            if spec_k < 1 or spec_ngram < 1:
                raise ValueError("spec_k and spec_ngram must be >= 1")
            # regime check: a verify step pushes max_slots*(spec_k+1) rows
            # through every matmul. Past the chip's roofline ridge
            # (~154 rows at 86 TFLOPs / 560 GB/s achievable for a 1.5B
            # model) the step turns MXU-bound and each verify costs far
            # more than a plain step — measured on v5e B=64: K=1 verify
            # 1.27x, K=3 2.4x a plain step, so acceptance must exceed
            # 0.27/1.4 extra tokens/step just to break even. Speculation's
            # honest home is the low-batch latency regime.
            if max_slots * (spec_k + 1) > 154:
                import warnings

                warnings.warn(
                    f"speculative decoding with max_slots={max_slots}, "
                    f"spec_k={spec_k} puts {max_slots * (spec_k + 1)} rows "
                    "through each verify matmul — past the ~154-row MXU "
                    "roofline ridge on v5e-class chips, verify steps are "
                    "compute-bound and usually lose to plain decode "
                    "(measured: B=64 K=3 sampled = 2.4x overhead at zero "
                    "acceptance). Use speculation at small batch.",
                    stacklevel=2)
        self.speculative = speculative
        self.spec_k = int(spec_k)
        self.spec_ngram = int(spec_ngram)
        if chunk_trim and (speculative or prefill_lane):
            raise ValueError(
                "chunk_trim is a plain-decode-program policy (mutually "
                "exclusive with speculative decoding and the prefill lane)")
        self.chunk_trim = bool(chunk_trim) and decode_chunk_len >= 2
        self._trim_chunk = max(1, decode_chunk_len // 2)
        # None = dynamic amortization gate from the measured exposed gap
        # (see _dispatch_decode); an int forces a fixed row threshold
        self.trim_min_rows: int | None = None
        self._trim_warm: set = set()   # (p_cur, s_cur) buckets with a warm
        #                                half-length program
        # worst-case device-side sequence advance per decode chunk: each of
        # the chunk's steps emits 1..spec_k+1 tokens under speculation
        self._max_adv = (decode_chunk_len * (self.spec_k + 1)
                         if speculative else decode_chunk_len)
        # admissions per scheduler iteration: default = all free slots
        # (max throughput); lower for tighter decode latency under load
        self.admit_batch = admit_batch if admit_batch is not None else max_slots
        if max_prefill_group is not None:
            self.MAX_PREFILL_GROUP = int(max_prefill_group)
        self.context_buckets = context_buckets
        if attn_impl is None:
            # paged mode, measured on v5e (1.5B, batch 64, ctx ≤512): XLA's
            # fused gather+attention beats both pallas paged kernels for
            # decode at these shapes (4.6k vs 2.7k tok/s); the kernels stay
            # selectable ("pallas" grid / "pallas2" page-streaming).
            # slot mode on TPU: the contiguous layout admits the multi-row
            # streaming kernel (ops/slot_attention.py) which runs at the
            # HBM floor — measured 6815 vs 6195 tok/s (r3) — so it is the
            # slot default there.
            from ..utils import is_tpu_backend

            attn_impl = ("pallas" if cache_mode == "slot"
                         and is_tpu_backend() else "xla")
        self.attn_impl = attn_impl

        import inspect

        _has_fused = "fused_decode" in inspect.signature(fam.forward).parameters
        if layer_fusion is None:
            # auto: Mosaic lowering needs 128-aligned dims; fusion targets
            # TPU single-chip bf16 serving (dense: full layer kernels;
            # MoE: attention-side kernels + ragged_dot experts)
            from ..utils import is_tpu_backend

            from ..ops.fused_layer import (
                fused_mlp_vmem_ok,
                fused_moe_vmem_ok,
                fused_vmem_ok,
            )

            c = self.cfg
            # the fused kernels see decode rows PLUS the prefill lane's
            # extra rows in one activation block — gate on the combined
            # width or a lane engine OOMs VMEM at warmup (r4: B=96+128)
            rows_eff = max_slots + int(prefill_lane or 0)
            if speculative:
                # verify steps flatten the K+1-token windows into rows:
                # every fused matmul sees max_slots*(spec_k+1) activations
                rows_eff = max_slots * (int(spec_k) + 1)
            if getattr(c, "latent_cache", False):  # MLA: MLP-side kernels
                fshared = c.moe_intermediate * c.n_shared_experts
                fit = (c.dense_intermediate % 128 == 0
                       and fshared % 128 == 0
                       and fused_mlp_vmem_ok(c.hidden, c.dense_intermediate,
                                             rows_eff)
                       and fused_mlp_vmem_ok(c.hidden, fshared, rows_eff))
            elif hasattr(c, "n_experts"):          # MoE: attention-side
                fit = (c.head_dim % 128 == 0
                       and fused_moe_vmem_ok(c, rows_eff)
                       and getattr(c, "moe_impl", "") == "ragged")
            else:                                   # dense: full layer
                from ..ops.fused_layer import fused_i8_vmem_ok

                vm = (fused_i8_vmem_ok if quantize == "int8"
                      else fused_vmem_ok)
                fit = (c.head_dim % 128 == 0
                       and c.intermediate % 128 == 0
                       and vm(c, rows_eff))
            is_dense = not (getattr(c, "latent_cache", False)
                            or hasattr(c, "n_experts"))
            layer_fusion = (
                _has_fused and is_tpu_backend() and mesh is None
                and (quantize is None or (quantize == "int8" and is_dense))
                and c.hidden % 128 == 0
                and fit)
        self.layer_fusion = bool(layer_fusion)
        if self.layer_fusion:
            # fused decode kernels read the packed wqkv / w_gateup layout
            # (bf16 or int8+scales); attention stays on the engine path
            if not _has_fused:
                raise ValueError(
                    f"model family {model_name!r} has no fused decode path")
            if mesh is not None:
                raise ValueError("layer_fusion requires single-chip serving")
            pack_weights = True
        if params is None:
            params = fam.init_params(self.cfg, jax.random.PRNGKey(seed))
        self.packed = False
        if pack_weights is None:
            # A/B on the axon v5e: packing shaves decode dispatch on CPU
            # (34 -> 25 ms) but is within noise on the TPU tunnel and
            # correlates with a first-dispatch stall there — default it off
            # on TPU, on elsewhere.
            from ..utils import is_tpu_backend

            pack_weights = not is_tpu_backend()
        if pack_weights and mesh is None:
            # single-chip serving: fuse QKV + dense gate/up into one matmul
            # each — decode is per-layer-launch-overhead-bound at small
            # batch, and packing is numerically identity. (Skipped under a
            # mesh: TP would split a packed matrix unevenly across q/k/v.)
            from .weights import pack_matmul_params

            new = pack_matmul_params(params)
            self.packed = new is not params and (
                "wqkv" in new.get("layers", {})
                or "w_gateup" in new.get("layers", {}))
            params = new
        if quantize == "int8":
            # halve weight-read bandwidth (dequant fused into the MXU
            # epilogue); norms/embeddings/router stay bf16. Routed experts
            # quantize too: they run the blocked grouped matmul
            # (ops/moe._expert_ffn_blocked) since ragged_dot has no int8
            # path. See ops/quant.py.
            from ..ops.quant import QUANT_KEYS, quantize_params

            params = quantize_params(params, keys=QUANT_KEYS)
        self.quantize = quantize

        # slot mode: contiguous per-slot cache [L, B, max_seq_len, K, D].
        # Attention reads a fusible dynamic slice (no gather copy) — faster
        # decode; trades away page-level prefix sharing. paged: vLLM-style.
        self.cache_mode = cache_mode
        # slot-mode prefix reuse is PARKING, not sharing (VERDICT r3 #2): a
        # finished sequence's KV stays in its slot row; a new request whose
        # prompt extends a parked row's tokens re-admits INTO that row and
        # prefills only the suffix — zero-copy re-entry for the multi-turn
        # tool-call workload (reference re-enters with the conversation so
        # far, scripts/deep_search.py:1820-1859). Stale KV past the match is
        # overwritten by the suffix prefill before any read. Token-exact
        # matching (no page granularity).
        self._slot_park = bool(enable_prefix_cache) and cache_mode == "slot"
        self._parked: dict[int, dict] = {}   # slot idx -> park record
        # park-hit re-entries reuse the row's device-resident seen mask
        # (repetition-penalty presence) instead of uploading a [Gp, V] bool
        # mask per prefill dispatch; _clear_w is the fixed program width of
        # the per-row "clear these ids" list (post-stop garbage tokens +
        # unmatched parked tail, both small — rows needing more fall back
        # to the upload path). Exact semantics either way.
        self.seen_keep = True
        self._clear_w = max(32, int(decode_chunk_len))
        if cache_mode == "slot":
            page_size = max_seq_len
            n_pages = max_slots
            self.page_size = page_size
            self.n_pages = n_pages
            self.max_pages_per_seq = 1
            enable_prefix_cache = False

        cfgv = self.cfg
        self.latent_cache = bool(getattr(cfgv, "latent_cache", False))
        if kv_quantize not in (None, "int8", "int8-force"):
            raise ValueError(f"unknown kv_quantize {kv_quantize!r}")
        if kv_quantize:
            if "k_scales" not in inspect.signature(fam.forward).parameters:
                raise ValueError(
                    f"model family {model_name!r} does not support int8 KV")
            if cache_mode == "slot" or self.latent_cache:
                raise ValueError("int8 KV requires the paged cache mode")
            from ..utils import is_tpu_backend

            if kv_quantize == "int8" and is_tpu_backend():
                # measured on v5e (1.5B, B=64): int8 KV decodes at 405-536
                # tok/s vs 6400 bf16 — the XLA gather+dequant chain defeats
                # the HBM savings on this chip regardless of storage layout
                # (int8 rows and int32-packed words both measured). Refuse
                # rather than silently serve 12-16x slower.
                raise ValueError(
                    "kv_quantize='int8' is 12-16x SLOWER than bf16 KV on "
                    "this TPU (XLA gather+dequant path; see CLAUDE.md "
                    "measurements). Pass kv_quantize='int8-force' only if "
                    "HBM capacity matters more than throughput.")
            kv_quantize = "int8"
        self.kv_quantize = kv_quantize
        # int8 pools are STORED as int32-packed words (4 lanes per word):
        # a raw int8 gather hits a scalar TPU path and a per-step bitcast of
        # the whole pool materializes GB-scale copies — packed storage keeps
        # the gather vectorized with zero per-step conversion.
        kv_dtype = jnp.int32 if kv_quantize else cfgv.jnp_dtype
        kv_last = cfgv.head_dim // 4 if kv_quantize else cfgv.head_dim
        if kv_quantize and cfgv.head_dim % 4:
            raise ValueError("int8 KV requires head_dim % 4 == 0")
        kshape = (cfgv.n_layers, n_pages, page_size, cfgv.n_kv_heads,
                  kv_last)
        self.kv_aux: dict[str, Any] = {}
        if kv_quantize:
            sshape = kshape[:-1]
            self.kv_aux = {"ks": jnp.zeros(sshape, jnp.float32),
                           "vs": jnp.zeros(sshape, jnp.float32)}
        self.k_pages = jnp.zeros(kshape, kv_dtype)
        if self.latent_cache:
            # MLA: one latent row per token lives in k_pages only; keep a
            # 1-page dummy v pool so the (k, v) engine plumbing is uniform
            # without doubling the cache's HBM footprint (ADVICE r1).
            self.v_pages = jnp.zeros((cfgv.n_layers, 1) + kshape[2:],
                                     kv_dtype)
        else:
            self.v_pages = jnp.zeros(kshape, kv_dtype)
        if mesh is not None:
            # multi-chip serving: params laid out per the rules table (TP over
            # heads/mlp, EP over experts), KV pools sharded over the kv-head
            # dim; XLA GSPMD inserts the collectives inside the jitted steps
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.sharding import SERVING_RULES, shard_pytree

            rules = rules or SERVING_RULES
            axes_tree = fam.logical_axes()
            if quantize:
                from ..ops.quant import quantized_logical_axes

                axes_tree = quantized_logical_axes(params, axes_tree)
            params = shard_pytree(params, axes_tree, mesh, rules)
            kv_axis = rules.axis("kv_heads")
            if kv_axis is not None:
                axes = (kv_axis,) if isinstance(kv_axis, str) else tuple(kv_axis)
                tp_size = int(np.prod([mesh.shape[a] for a in axes]))
                if cfgv.n_kv_heads % max(tp_size, 1):
                    kv_axis = None  # e.g. MLA's single latent head: replicate
            kv_spec = P(None, None, None, kv_axis, None)
            kv_sharding = NamedSharding(mesh, kv_spec)
            self.k_pages = jax.device_put(self.k_pages, kv_sharding)
            self.v_pages = jax.device_put(self.v_pages, kv_sharding)
            if self.kv_aux:
                s_sharding = NamedSharding(mesh, P(None, None, None, kv_axis))
                self.kv_aux = {k: jax.device_put(v, s_sharding)
                               for k, v in self.kv_aux.items()}
        self.params = params
        self.allocator = PageAllocator(n_pages, page_size)
        if enable_prefix_cache:
            from .prefix_cache import make_prefix_cache

            self.prefix_cache = make_prefix_cache(self.allocator)
        else:
            self.prefix_cache = None

        B, V = max_slots, cfgv.vocab_size
        self.slots = [_Slot(i) for i in range(B)]
        self.page_tables = np.zeros((B, self.max_pages_per_seq), np.int32)
        if cache_mode == "slot":
            self.page_tables[:, 0] = np.arange(B)
        self.seq_lens = np.zeros((B,), np.int32)
        self.last_tok = np.zeros((B,), np.int32)
        self.seen = jnp.zeros((B, V), bool)
        self.samp_host = {
            "temperature": np.full((B,), 0.7, np.float32),
            "top_k": np.full((B,), 20, np.int32),
            "top_p": np.full((B,), 0.8, np.float32),
            "min_p": np.full((B,), 0.05, np.float32),
            "repetition_penalty": np.full((B,), 1.05, np.float32),
        }
        self.min_tokens = np.zeros((B,), np.int32)
        self.prompt_lens = np.zeros((B,), np.int32)
        if self.speculative:
            # token history for the n-gram draft lookup: host mirror carries
            # each row's prompt at admission; the decode program extends it
            # in-carry with emitted tokens (hist[b, q] = token at position q)
            self.hist_host = np.zeros((B, max_seq_len), np.int32)
            self.toks_hist = jnp.zeros((B, max_seq_len), jnp.int32)
        self.rng = jax.random.PRNGKey(seed)
        self.step_counter = 0

        self.pipeline_decode = pipeline_decode
        self.ring_prefill_len = ring_prefill_len
        self.sp_impl = sp_impl
        # admission-injection capacity: how many dispatched-but-unsynced
        # prefill groups can feed first tokens device-side into one decode
        # chunk. Sized so a full cold burst (max_slots / MAX_PREFILL_GROUP
        # groups) never syncs a prefill inline before decode starts — each
        # inline sync costs a full tunnel round trip (~58ms measured r3,
        # the main burst e2e/decode gap).
        self.n_inject = max(2, min(6, -(-max_slots // self.MAX_PREFILL_GROUP)))
        self._pending = None           # in-flight decode chunk (see _dispatch)
        self._last_decode_end = 0.0    # pipelined decode_time accounting
        self._chunk_ema = 0.0          # smoothed decode-chunk wall time
        #   (sizes the adaptive closed-loop refill grace and the
        #   pipelining churn break-even in _churn_imminent)
        self.churn_rtt_s = 0.035       # assumed dispatch round trip that
        #   pipelining hides (axon tunnel ~35ms); 0 restores the r3
        #   any-completing-row pipelining skip
        # measured inter-chunk exposed gap on the non-pipelined path (sync →
        # next dispatch returned, minus prefill-dispatch work that keeps the
        # device busy in between). Replaces the churn_rtt_s ASSUMPTION in the
        # churn break-even once a few skip-path chunks have been observed —
        # the r4 spans showed the real exposed cost (readback + merge + admit
        # + prep + dispatch) is workload-dependent and can be 2-3x the 35ms
        # guess, which made the threshold skip pipelining too eagerly.
        self._gap_ema = 0.0
        self._gap_armed = False
        self._gap_spec = False
        self._gap_t0 = 0.0
        self._gap_pf0 = 0.0
        # refill-grace policy: "fixed" (the r3 2ms wait — the measured
        # default), "adaptive" (chunk-EMA-sized wait that stops once every
        # freed slot has a request), "off". A/B on the agent workload
        # (scripts/probe_grace.py, 8 interleaved rounds at B=96): adaptive
        # 4399 decode / 3464 e2e vs fixed 4385 / 3463 — statistically
        # identical, and grace_wait_s engaged only 1-7ms per 5s window:
        # closed-loop resubmits already land within the fixed 2ms handoff,
        # so refill latency is NOT the agent-mode occupancy bottleneck
        # (mid-chunk completion waste is — see chunk_trim).
        self.refill_grace = "fixed"
        # device copies of slow-changing host state; re-uploaded only after
        # a host mutation (every host→device transfer is a tunnel round trip)
        self._host_version = 0
        self._dev_cache: dict[str, tuple[int, Any]] = {}
        self._queue: "queue.Queue[tuple[GenerationRequest, Future]]" = queue.Queue()
        self.prefill_lane = int(prefill_lane or 0)
        if lane_max_act:  # instance override of the class default
            self.LANE_MAX_ACT = int(lane_max_act)
        if self.prefill_lane:
            if "lane_tokens" not in inspect.signature(fam.forward).parameters:
                raise ValueError(
                    f"model family {model_name!r} has no prefill-lane path")
        # pending lane work: [{"p": prepared-request dict, "off": int}]
        self._lane: list[dict] = []
        self._chunk_seq = 0   # dispatch counter for lane abort draining
        self._deferred: list[tuple[GenerationRequest, Future]] = []
        # admission injection: dispatched-but-unsynced prefill groups whose
        # first tokens feed the next decode chunk device-side (≤2 at a time)
        self._inject_handles: list[dict] = []
        # preempted-sequence continuations keyed by future: generated
        # tokens + stop/detok state restored at re-admission (vLLM-style
        # preempt-by-recompute; the freed pages are parked in the prefix
        # cache so the re-prefill usually reuses them)
        self._resumes: dict[Future, dict] = {}
        self._aborts: set[str] = set()
        self._wake = threading.Event()
        self._stopping = False
        self._thread: threading.Thread | None = None
        self._jit_cache: dict[int, Any] = {}

        # telemetry (reference keeps per-category api_counters,
        # scripts/deep_search.py:3515-3523; we add engine-side step timing)
        self.stats = {
            "requests": 0, "prefill_tokens": 0, "decode_tokens": 0,
            "decode_steps": 0, "decode_time_s": 0.0, "prefill_time_s": 0.0,
            "preemptions": 0, "lane_tokens": 0,
            # occupancy diagnostics: dispatched row-steps (active rows x
            # chunk per decode dispatch — the ceiling on decode_tokens) and
            # batched-prefill dispatch count/rows (group-size health)
            "slot_steps": 0, "prefill_dispatches": 0, "prefill_rows": 0,
            "seen_keep_rows": 0,
            "injected_groups": 0,
            # slot-mode prefix parking (zero-copy multi-turn re-entry)
            "slot_park_hits": 0, "slot_park_tokens": 0,
            # half-length decode chunks dispatched near known completions
            "trim_chunks": 0,
            # chunks dispatched from the previous chunk's device carry
            # (pipelined: no exposed dispatch round trip)
            "pipelined_chunks": 0,
            # programs built after warmup() — each is a lazy remote
            # compile (~12s serving stall on axon); should stay 0
            "post_warmup_builds": 0,
            # time spent in the adaptive closed-loop refill grace
            "grace_wait_s": 0.0,
        }
        # high-water mark for non-overlapping prefill-time accounting: under
        # two-phase admission all groups dispatch back-to-back before any
        # sync, so summing raw per-group [t0, sync] intervals double-counts
        # the overlap (and can exceed wall time)
        self._prefill_clock = 0.0

        from .profiling import SpanTimer

        self.spans = SpanTimer()
        # decode programs keyed by (slot_ctx bucket, lane_on). Engines with
        # a prefill lane keep BOTH variants: the lane program's extra rows
        # cost ~9% per step even when the lane is empty (measured r4,
        # B=96+lane64 burst 7686 vs 8428 tok/s), so idle-lane chunks
        # dispatch the plain program.
        self._decode_fn_cache: dict[tuple, Any] = {}

    # ---------------------------------------------------------------- jit fns

    def _slot_buckets(self) -> list[int]:
        """Token-width buckets for the contiguous-slot cache — the decode
        program reads pool[:, :bucket] (a fused slice, no gather), so early
        decode moves only the smallest bucket covering the longest active
        context. Same pow2(+1.5x midpoint) ladder as _decode_buckets."""
        cap = self.max_seq_len
        if not self.context_buckets:
            return [cap]
        fine = self.context_buckets == "fine"
        out = set()
        b = 64
        while b < cap:
            out.add(b)
            if fine and 64 < (b * 3) // 2 < cap:
                out.add((b * 3) // 2)
            b *= 2
        out.add(cap)
        return sorted(out)

    def _decode_program(self, slot_ctx: int | None = None,
                        lane: bool = False, spec: bool = False,
                        chunk_len: int | None = None):
        if self.cache_mode != "slot":
            slot_ctx = None
        key = (slot_ctx, bool(lane), bool(spec), chunk_len)
        fn = self._decode_fn_cache.get(key)
        if fn is None:
            if getattr(self, "_warmed", False):
                self.stats["post_warmup_builds"] += 1
                print(f"[engine] post-warmup decode program build: "
                      f"(slot_ctx,lane,spec,chunk)={key}", file=sys.stderr)
            if spec:
                fn = self._build_decode_spec_fn(slot_ctx)
            else:
                fn = self._build_decode_fn(slot_ctx, lane=lane,
                                           chunk_len=chunk_len)
            self._decode_fn_cache[key] = fn
        return fn

    def _decode_buckets(self) -> list[int]:
        """Page-count buckets up to the per-seq page budget.

        ``context_buckets=True`` → pow2 ladder; ``"fine"`` adds the 1.5x
        midpoints (3, 6, 12, ...) — the XLA gather attention reads the whole
        bucket per row, so finer buckets cut tail-step padding (a sequence
        just past a pow2 boundary otherwise reads ~2x its context) at the
        cost of one extra jitted decode program per midpoint."""
        cap = self.max_pages_per_seq
        if not self.context_buckets:
            return [cap]
        fine = self.context_buckets == "fine"
        out = set()
        b = 1
        while b < cap:
            out.add(b)
            if fine and 1 < (b * 3) // 2 < cap:
                out.add((b * 3) // 2)
            b *= 2
        out.add(cap)
        return sorted(out)

    def _build_decode_fn(self, slot_ctx: int | None = None,
                         lane: bool = False, chunk_len: int | None = None):
        if lane:
            return self._build_decode_lane_fn(slot_ctx)
        cfg, fwd = self.cfg, self.forward
        chunk = chunk_len or self.decode_chunk_len
        impl = self.attn_impl

        eos_id = self.tokenizer.eos_id if self.tokenizer.eos_id is not None else -1
        slot_mode = self.cache_mode == "slot"

        kv_q = bool(self.kv_quantize)

        n_inject = self.n_inject

        @partial(jax.jit, donate_argnums=(0, 1, 2, 5))
        def decode_chunk(k_pages, v_pages, kv_aux, params, page_tables, seen,
                         last_tok, seq_lens, host_last, host_lens, use_host,
                         active, samp, key, min_tokens, prompt_lens,
                         inject_rows, inject_toks):
            # pipelined dispatch: rows reset on the host since the carry was
            # produced (admitted/finished) take the host values; merging here
            # keeps it inside the one decode program (a separate scatter
            # would be its own multi-second remote compile on axon)
            last_tok = jnp.where(use_host, host_last, last_tok)
            seq_lens = jnp.where(use_host, host_lens, seq_lens)
            # admission injection: freshly prefilled rows take their first
            # token straight from the prefill programs' device outputs —
            # the chunk after a refill dispatches without waiting for any
            # prefill sync (rows=B for padding: scatter dropped)
            for gi in range(n_inject):
                last_tok = last_tok.at[inject_rows[gi]].set(inject_toks[gi],
                                                            mode="drop")
            def step(carry, step_key):
                kp, vp, aux, last, lens, seen = carry
                sp = SamplingParams(
                    samp["temperature"], samp["top_k"], samp["top_p"],
                    samp["min_p"], samp["repetition_penalty"],
                    min_tokens=min_tokens,
                    tokens_generated=lens - prompt_lens + 1,
                    eos_id=eos_id,
                )
                pos = jnp.where(active, lens, -1)[:, None]
                fwd_kw = ({"slot_decode": True, "slot_ctx": slot_ctx}
                          if slot_mode else {})
                if self.layer_fusion:
                    fwd_kw["fused_decode"] = True
                if kv_q:
                    fwd_kw.update(k_scales=aux["ks"], v_scales=aux["vs"])
                logits, cache = fwd(
                    params, cfg, last[:, None], pos,
                    k_pages=kp, v_pages=vp, page_table=page_tables,
                    seq_lens=lens + active.astype(jnp.int32),
                    impl=impl, **fwd_kw,
                )
                if kv_q:
                    kp, vp, aux = cache[0], cache[1], {"ks": cache[2],
                                                       "vs": cache[3]}
                else:
                    kp, vp = cache
                nxt = sample(logits[:, 0], sp, seen, step_key)
                nxt = jnp.where(active, nxt, last)
                seen = update_seen(seen, nxt)
                lens = lens + active.astype(jnp.int32)
                return (kp, vp, aux, nxt, lens, seen), nxt

            keys = jax.random.split(key, chunk)
            (k_pages, v_pages, kv_aux, last_tok, seq_lens, seen), toks =                 jax.lax.scan(
                    step, (k_pages, v_pages, kv_aux, last_tok, seq_lens, seen),
                    keys)
            return (k_pages, v_pages, kv_aux, seen, last_tok, seq_lens,
                    toks.T)  # [B, chunk]

        return decode_chunk

    def _build_decode_spec_fn(self, slot_ctx: int | None = None):
        """Decode-chunk program with n-gram speculative verify steps.

        Each scan step drafts ``spec_k`` tokens per row from the device
        token history (engine/speculative.py), runs ONE forward over the
        K+1-token window ([last, d_0..d_{K-1}] at positions p..p+K — the
        HBM-bound weight read is shared by all K+1 tokens), samples every
        window position in one batched sampler pass, and emits the longest
        draft-matching prefix plus the first correction token (exact-match
        acceptance: emitted tokens are always true samples).

        Rejected tokens' KV needs no cleanup: the contiguous-slot layout
        means the next step's window (which starts at the new length) always
        covers and overwrites the stale positions before any read, and
        attention masks by per-query position meanwhile.
        """
        cfg, fwd = self.cfg, self.forward
        chunk = self.decode_chunk_len
        impl = self.attn_impl
        K = self.spec_k
        K1 = K + 1
        NGRAM = self.spec_ngram

        eos_id = self.tokenizer.eos_id if self.tokenizer.eos_id is not None else -1
        n_inject = self.n_inject

        from .speculative import accept_drafts, ngram_draft

        @partial(jax.jit, donate_argnums=(0, 1, 2, 5, 6))
        def decode_chunk(k_pages, v_pages, kv_aux, params, page_tables, seen,
                         hist, last_tok, seq_lens, host_last, host_lens,
                         host_hist, use_host, active, samp, key, min_tokens,
                         prompt_lens, inject_rows, inject_toks):
            last_tok = jnp.where(use_host, host_last, last_tok)
            seq_lens = jnp.where(use_host, host_lens, seq_lens)
            hist = jnp.where(use_host[:, None], host_hist, hist)
            for gi in range(n_inject):
                last_tok = last_tok.at[inject_rows[gi]].set(inject_toks[gi],
                                                            mode="drop")
            B = last_tok.shape[0]
            S = hist.shape[1]
            rows = jnp.arange(B)
            # invariant: hist[b, lens[b]] == last_tok[b] (the prompt rows
            # merged from the host carry only positions < prompt_len; the
            # first sampled / injected token sits at position lens)
            hist = hist.at[rows, jnp.clip(seq_lens, 0, S - 1)].set(last_tok)

            # per-row sampler params repeated per window position (row-major
            # pairing (b, i) -> b*K1 + i matches the logits reshape below)
            samp_r = {k: jnp.repeat(v, K1, axis=0) for k, v in samp.items()}
            min_r = jnp.repeat(min_tokens, K1, axis=0)
            pos_off = jax.lax.broadcasted_iota(jnp.int32, (B, K1), 1)

            def step(carry, step_key):
                kp, vp, aux, last, lens, seen, hist = carry
                draft = ngram_draft(hist, lens, K, n=NGRAM)       # [B, K]
                win = jnp.concatenate([last[:, None], draft], axis=1)
                pos = lens[:, None] + pos_off                     # [B, K1]
                pos = jnp.where(active[:, None], pos, -1)
                fwd_kw = {"slot_decode": True, "slot_ctx": slot_ctx}
                if self.layer_fusion:
                    # T = K+1 verify windows flatten into B*(K+1) activation
                    # rows through the same fused layer kernels; attention
                    # takes the windowed slot kernel (per-query causal
                    # limits). Without this the verify step pays the full
                    # unfused per-layer small-op overhead — measured 1.8x a
                    # plain step at B=8 where the window matmul itself is
                    # HBM-bound and should be ~free.
                    fwd_kw["fused_decode"] = True
                logits, cache = fwd(
                    params, cfg, win, pos,
                    k_pages=kp, v_pages=vp, page_table=page_tables,
                    seq_lens=lens + K1 * active.astype(jnp.int32),
                    impl=impl, **fwd_kw,
                )
                kp, vp = cache
                # one batched sampler pass over all window positions. The
                # documented approximation: within this <=K1-token window the
                # repetition penalty sees the window-start ``seen`` set.
                sp = SamplingParams(
                    samp_r["temperature"], samp_r["top_k"], samp_r["top_p"],
                    samp_r["min_p"], samp_r["repetition_penalty"],
                    min_tokens=min_r,
                    tokens_generated=(
                        (lens - prompt_lens + 1)[:, None] + pos_off
                    ).reshape(B * K1),
                    eos_id=eos_id,
                )
                seen_r = jnp.repeat(seen, K1, axis=0)
                t = sample(logits.reshape(B * K1, -1), sp, seen_r,
                           step_key).reshape(B, K1)
                ncons, nxt, alive = accept_drafts(t, draft, active)
                nxt = jnp.where(active, nxt, last)
                emit = alive & active[:, None]
                V = seen.shape[1]
                rows_b = jax.lax.broadcasted_iota(jnp.int32, (B, K1), 0)
                seen = seen.at[rows_b, jnp.where(emit, t, V)].set(
                    True, mode="drop")
                posw = lens[:, None] + 1 + pos_off
                hist = hist.at[rows_b,
                               jnp.where(emit & (posw < S), posw, S)].set(
                                   t, mode="drop")
                lens = lens + ncons
                return (kp, vp, aux, nxt, lens, seen, hist), (t, ncons)

            keys = jax.random.split(key, chunk)
            (k_pages, v_pages, kv_aux, last_tok, seq_lens, seen, hist), ys = \
                jax.lax.scan(
                    step,
                    (k_pages, v_pages, kv_aux, last_tok, seq_lens, seen,
                     hist), keys)
            toks, cnts = ys                       # [chunk, B, K1], [chunk, B]
            return (k_pages, v_pages, kv_aux, seen, hist, last_tok, seq_lens,
                    toks.transpose(1, 0, 2), cnts.T)  # [B,chunk,K1], [B,chunk]

        return decode_chunk

    def _build_decode_lane_fn(self, slot_ctx: int | None = None):
        """Decode-chunk program with the in-flight prefill lane: every step
        carries ``Tp`` prompt tokens of one pending request through the same
        forward (models/qwen3.forward lane args) — prompt prefill rides
        decode's HBM-bound weight reads instead of stalling it. Prompts that
        complete mid-chunk get their first token sampled post-scan from the
        recorded lane logits; the host activates their slots at process
        time. Works for both cache layouts: paged (lane pages via
        lane_table) and slot (lane writes into slot row lane_table[0]'s
        contiguous buffer; ``slot_ctx`` buckets the pool slice)."""
        cfg, fwd = self.cfg, self.forward
        chunk = self.decode_chunk_len
        impl = self.attn_impl
        A = self.LANE_MAX_ACT
        slot_mode = self.cache_mode == "slot"

        eos_id = self.tokenizer.eos_id if self.tokenizer.eos_id is not None else -1
        kv_q = bool(self.kv_quantize)

        n_inject = self.n_inject

        @partial(jax.jit, donate_argnums=(0, 1, 2, 5))
        def decode_chunk(k_pages, v_pages, kv_aux, params, page_tables, seen,
                         last_tok, seq_lens, host_last, host_lens, use_host,
                         active, samp, key, min_tokens, prompt_lens,
                         inject_rows, inject_toks,
                         lane_tokens, lane_pos, lane_tables,
                         lane_logit_rows, act_slots, act_steps):
            last_tok = jnp.where(use_host, host_last, last_tok)
            seq_lens = jnp.where(use_host, host_lens, seq_lens)
            for gi in range(n_inject):
                last_tok = last_tok.at[inject_rows[gi]].set(inject_toks[gi],
                                                            mode="drop")

            def step(carry, xs):
                kp, vp, aux, last, lens, seen = carry
                (step_key, ltoks, lpos, ltab, lrow) = xs
                sp = SamplingParams(
                    samp["temperature"], samp["top_k"], samp["top_p"],
                    samp["min_p"], samp["repetition_penalty"],
                    min_tokens=min_tokens,
                    tokens_generated=lens - prompt_lens + 1,
                    eos_id=eos_id,
                )
                pos = jnp.where(active, lens, -1)[:, None]
                fwd_kw = ({"slot_decode": True, "slot_ctx": slot_ctx}
                          if slot_mode else {})
                if self.layer_fusion:
                    fwd_kw["fused_decode"] = True
                if kv_q:
                    fwd_kw.update(k_scales=aux["ks"], v_scales=aux["vs"])
                logits, cache = fwd(
                    params, cfg, last[:, None], pos,
                    k_pages=kp, v_pages=vp, page_table=page_tables,
                    seq_lens=lens + active.astype(jnp.int32),
                    impl=impl,
                    lane_tokens=ltoks, lane_positions=lpos, lane_table=ltab,
                    lane_logit_row=lrow, **fwd_kw,
                )
                if kv_q:
                    kp, vp, aux = cache[0], cache[1], {"ks": cache[2],
                                                       "vs": cache[3]}
                else:
                    kp, vp = cache
                B = last.shape[0]
                nxt = sample(logits[:B, 0], sp, seen, step_key)
                nxt = jnp.where(active, nxt, last)
                seen = update_seen(seen, nxt)
                lens = lens + active.astype(jnp.int32)
                return (kp, vp, aux, nxt, lens, seen), (nxt, logits[B, 0])

            keys = jax.random.split(key, chunk + 1)
            (k_pages, v_pages, kv_aux, last_tok, seq_lens, seen), ys = \
                jax.lax.scan(
                    step, (k_pages, v_pages, kv_aux, last_tok, seq_lens, seen),
                    (keys[:chunk], lane_tokens, lane_pos, lane_tables,
                     lane_logit_rows))
            toks, lane_logits = ys            # [chunk, B], [chunk, V]

            # ---- first-token sampling for prompts completed this chunk ----
            # (act rows padded with slot=max_slots step=0 are folded with
            # mode="drop" and their sampled tokens ignored host-side).
            # act_seen is built ON DEVICE from the activating steps' lane
            # tokens — the whole prompt is in lane_tokens[step] under the
            # fresh-only lane contract, saving an [A, V] host upload per
            # dispatch.
            slot_c = jnp.clip(act_slots, 0, seen.shape[0] - 1)
            steps_c = jnp.clip(act_steps, 0, chunk - 1)
            act_logits = lane_logits[steps_c]
            act_toks = lane_tokens[steps_c]                      # [A, Tp]
            act_valid = lane_pos[steps_c] >= 0
            V = seen.shape[1]
            rows_a = jax.lax.broadcasted_iota(jnp.int32, act_toks.shape, 0)
            act_seen = jnp.zeros((A, V), bool).at[
                rows_a, jnp.where(act_valid, act_toks, V)].set(
                    True, mode="drop")
            asp = SamplingParams(
                samp["temperature"][slot_c], samp["top_k"][slot_c],
                samp["top_p"][slot_c], samp["min_p"][slot_c],
                samp["repetition_penalty"][slot_c],
                min_tokens=min_tokens[slot_c],
                tokens_generated=jnp.zeros((A,), jnp.int32),
                eos_id=eos_id,
            )
            seen = seen.at[act_slots].set(act_seen, mode="drop")
            act_first = sample(act_logits, asp, act_seen, keys[chunk])
            seen = seen.at[act_slots, act_first].set(True, mode="drop")
            return (k_pages, v_pages, kv_aux, seen, last_tok, seq_lens,
                    toks.T, act_first)

        return decode_chunk

    def _ring_prefill(self, bucket: int, fresh: bool) -> bool:
        """Fresh prefills at/over ``ring_prefill_len`` run ring attention:
        the chunk's sequence shards over the mesh's tp axis and K/V blocks
        rotate over ICI (ops/ring_attention.py) — prefill beyond one chip's
        attention budget (SURVEY.md §2.3 SP; the reference truncates)."""
        return (fresh and self.ring_prefill_len is not None
                and self.mesh is not None
                and self.mesh.shape.get("tp", 1) > 1
                and bucket >= self.ring_prefill_len
                and bucket % self.mesh.shape["tp"] == 0)

    def _prefill_fn(self, key):
        """Jitted prefill + first-token sample, keyed by
        ``(token bucket, group size, fresh, ring)``.

        The whole admission step for a group is ONE device program: forward,
        sampling, and the seen-mask fold all fuse — with remote compilation
        (axon) each extra program costs a multi-second round trip, so
        admission latency is dominated by dispatch count, not FLOPs.
        ``fresh`` (no cached prefix in the group) switches the model to
        causal attention over the chunk instead of gathering the page budget;
        ``ring`` additionally shards that attention over the mesh.
        """
        if key in self._jit_cache:
            return self._jit_cache[key]
        if getattr(self, "_warmed", False):
            # every program built after warmup() is a lazy remote compile
            # (~12s serving stall on axon) — count + warn so a poisoned
            # bench window is attributable (vs a tunnel hiccup)
            self.stats["post_warmup_builds"] += 1
            print(f"[engine] post-warmup prefill program build: "
                  f"(bucket,group,fresh,ring)={key}", file=sys.stderr)
        bucket, Gp, fresh, ring = key
        cfg, fwd = self.cfg, self.forward
        impl = self.sp_impl if ring else self.attn_impl
        ring_kw = {"ring_mesh": self.mesh, "ring_axis": "tp"} if ring else {}
        eos_id = self.tokenizer.eos_id if self.tokenizer.eos_id is not None else -1

        kv_q = bool(self.kv_quantize)

        @partial(jax.jit, donate_argnums=(0, 1, 2, 10))
        def prefill(k_pages, v_pages, kv_aux, params, tokens, positions,
                    page_table, seq_lens, logits_idx, rows, seen, seen_rows,
                    keep_rows, derive_rows, clear_rows, samp, min_toks,
                    sample_key):
            kv_kw = ({"k_scales": kv_aux["ks"], "v_scales": kv_aux["vs"]}
                     if kv_q else {})
            logits, cache = fwd(
                params, cfg, tokens, positions,
                k_pages=k_pages, v_pages=v_pages, page_table=page_table,
                seq_lens=seq_lens, logits_indices=logits_idx, impl=impl,
                fresh_prefill=fresh, **ring_kw, **kv_kw,
            )
            if kv_q:
                k_pages, v_pages = cache[0], cache[1]
                kv_aux = {"ks": cache[2], "vs": cache[3]}
            else:
                k_pages, v_pages = cache
            if fresh:
                # fresh groups carry their WHOLE prompt in `tokens`, so the
                # token-presence rows are derived on device — the host path
                # built + uploaded a [Gp, V] bool mask per dispatch (~0.5MB
                # of tunnel traffic and numpy scatter at every refill)
                rid = jax.lax.broadcasted_iota(jnp.int32, tokens.shape, 0)
                tok_or_oob = jnp.where(positions >= 0, tokens,
                                       seen.shape[1])
                seen_rows = jnp.zeros((Gp, seen.shape[1]), bool).at[
                    rid, tok_or_oob].set(True, mode="drop")
            else:
                # the non-fresh program (run universally by prefix-reusing
                # engines) derives token-presence rows on device wherever
                # it can, instead of shipping a host-built [Gp, V] bool
                # mask (~0.5MB of tunnel traffic per dispatch — the r5
                # agent-window profile showed ~10MB/window of these):
                #  - derive_rows (cached_len == 0): the whole prompt is in
                #    `tokens`, presence = suffix presence (fresh-path rule)
                #  - keep_rows (slot-park re-entries): row = (parked mask
                #    minus the known post-stop garbage ids in clear_rows)
                #    | suffix presence. Exact — the host clears every seen
                #    token not in the new prompt (_prepare_request), so
                #    the result equals presence(full prompt) bit-for-bit.
                #  - everything else (paged prefix hits, partial park
                #    matches, clear-list overflow): uploaded seen_rows.
                rid = jax.lax.broadcasted_iota(jnp.int32, tokens.shape, 0)
                tok_or_oob = jnp.where(positions >= 0, tokens,
                                       seen.shape[1])
                suffix_pres = jnp.zeros((Gp, seen.shape[1]), bool).at[
                    rid, tok_or_oob].set(True, mode="drop")
                kept = seen[jnp.clip(rows, 0, seen.shape[0] - 1)]
                rid_c = jax.lax.broadcasted_iota(jnp.int32,
                                                 clear_rows.shape, 0)
                kept = kept.at[rid_c, clear_rows].set(False, mode="drop")
                seen_rows = jnp.where(derive_rows[:, None], suffix_pres,
                                      seen_rows)
                seen_rows = jnp.where(keep_rows[:, None],
                                      kept | suffix_pres, seen_rows)
            sp = SamplingParams(
                samp["temperature"], samp["top_k"], samp["top_p"],
                samp["min_p"], samp["repetition_penalty"],
                min_tokens=min_toks, tokens_generated=jnp.zeros_like(min_toks),
                eos_id=eos_id,
            )
            first = sample(logits[:, 0], sp, seen_rows, sample_key)
            # fold the group's token-presence rows + sampled first token into
            # the engine-wide seen mask; padding rows carry row index B
            # (out of bounds => scatter dropped)
            seen = seen.at[rows].set(seen_rows, mode="drop")
            seen = seen.at[rows, first].set(True, mode="drop")
            # fixed-width first-token output: admission injection feeds this
            # array straight into the next decode chunk's program (device to
            # device, no host round trip), so every group shape must produce
            # the same [MAX_PREFILL_GROUP] shape
            first = jnp.pad(first, (0, self.MAX_PREFILL_GROUP - Gp))
            return k_pages, v_pages, kv_aux, seen, first

        self._jit_cache[key] = prefill
        return prefill

    # ------------------------------------------------------------- public API

    def submit(self, req: GenerationRequest) -> Future:
        fut: Future = Future()
        self._queue.put((req, fut))
        self._wake.set()
        self.start()
        return fut

    def submit_many(self, reqs: list[GenerationRequest]) -> list[Future]:
        """Enqueue a batch atomically: the scheduler sees all of them in one
        admission pass, so a burst prefills in aligned groups instead of one
        straggler trailing the batch by a chunk (per-request ``submit`` in a
        loop races the scheduler's poll)."""
        futs: list[Future] = [Future() for _ in reqs]
        self._queue.put(list(zip(reqs, futs)))
        self._wake.set()
        self.start()
        return futs

    def generate(self, req: GenerationRequest) -> GenerationResult:
        return self.submit(req).result()

    def abort(self, request_id: str) -> bool:
        """Cancel an in-flight or queued request.

        Queued requests are dropped (future cancelled); active ones finish at
        the next chunk boundary with finish_reason='aborted'. Returns whether
        the id was found."""
        self._aborts.add(request_id)
        self._wake.set()
        return True

    def load_lora_adapter(self, lora_path: str, scale: float | None = None) -> None:
        """Hot-load a LoRA adapter by merging it into the served weights.

        Parity with the reference demo's vLLM ``/load_lora_adapter`` hot-load
        (reference: demo/settings.py:99-112). The adapter is an orbax
        checkpoint of a train.lora adapter tree (see train/lora.py);
        merging keeps serving overhead at zero. Safe to call between
        requests; in-flight decodes keep the old weights until the next jit
        call picks up the new param buffers."""
        from ..train.checkpoint import restore_params
        from ..train.lora import apply_lora

        lora = restore_params(lora_path)
        if scale is not None:
            def rescale(ad):
                if isinstance(ad, dict) and "alpha" in ad:
                    ad = dict(ad)
                    ad["alpha"] = scale * ad["rank"]
                return ad
            lora = jax.tree.map(rescale, lora,
                                is_leaf=lambda v: isinstance(v, dict) and "a" in v)
        params = self.params
        if self.packed:
            # adapters target the unpacked layout; unpack, merge, repack
            from .weights import pack_matmul_params, unpack_matmul_params

            params = unpack_matmul_params(params, self.cfg)
        params = apply_lora(params, lora)
        if self.packed:
            params = pack_matmul_params(params)
        self.params = params

    def warmup(self, prompt_lens=(128,), group_sizes=None, decode=True,
               fresh_variants=None, max_ctx: int | None = None) -> None:
        """Pre-compile the hot programs so serving never pays compile latency.

        Dispatches dummy prefill groups (per prompt-length bucket x group
        size x fresh flag) and one dummy decode chunk. All dummy work writes
        to the null page / out-of-bounds seen rows, so engine state is
        untouched. Call before submitting requests (not thread-safe with the
        scheduler loop). On the axon TPU path every distinct program costs a
        multi-second remote compile — warming here moves that out of the
        measured serving window.

        ``max_ctx`` bounds the context buckets compiled for decode: when the
        deployment knows its prompt+generation ceiling, buckets beyond it are
        skipped (each unused bucket is a wasted multi-second remote compile —
        the ladder to a 512-token budget alone is ~7 programs). Sequences
        that outgrow the hint still work; they just pay one lazy compile.
        """
        if fresh_variants is None:
            # prefix-reusing engines (paged prefix cache / slot parking)
            # run the NON-fresh prefill program universally (see
            # _prefill_group_dispatch) — one variant per shape; leaving a
            # shape to lazy compile costs a ~12s remote stall mid-serving
            # (measured r4 agent-mode collapse)
            reuses_prefix = self.prefix_cache is not None or self._slot_park
            fresh_variants = (False,) if reuses_prefix else (True,)
        if group_sizes is None:  # every ladder group the scheduler can form
            group_sizes, g = [], 1
            while g <= self.MAX_PREFILL_GROUP:
                group_sizes.append(g)
                g *= 4
            group_sizes = tuple(group_sizes)
        B = self.max_slots
        for plen in prompt_lens:
            bucket = self._bucket(max(int(plen), 1))
            cap = self._group_cap(bucket)
            for G in group_sizes:
                Gp = self._pow2(min(G, cap), cap)
                for fresh in fresh_variants:
                    prefill = self._prefill_fn(
                        (bucket, Gp, fresh, self._ring_prefill(bucket, fresh)))
                    samp = {k: jnp.asarray(np.repeat(v[:1], Gp))
                            for k, v in self.samp_host.items()}
                    self.rng, sk = jax.random.split(self.rng)
                    (self.k_pages, self.v_pages, self.kv_aux, self.seen,
                     _) = prefill(
                        self.k_pages, self.v_pages, self.kv_aux, self.params,
                        jnp.zeros((Gp, bucket), jnp.int32),
                        jnp.full((Gp, bucket), -1, jnp.int32),
                        jnp.zeros((Gp, self.max_pages_per_seq), jnp.int32),
                        jnp.zeros((Gp,), jnp.int32),
                        jnp.zeros((Gp,), jnp.int32),
                        jnp.full((Gp,), B, jnp.int32),   # rows: dropped
                        self.seen,
                        jnp.zeros((Gp, self.cfg.vocab_size), bool),
                        jnp.zeros((Gp,), bool), jnp.zeros((Gp,), bool),
                        jnp.full((Gp, self._clear_w), self.cfg.vocab_size,
                                 jnp.int32),
                        samp, jnp.zeros((Gp,), jnp.int32), sk,
                    )
        if decode:
            if self.cache_mode == "slot":
                buckets = (self._slot_buckets() if self.context_buckets
                           else [None])
                if max_ctx is not None and self.context_buckets:
                    keep = [b for b in buckets if b < max_ctx]
                    # + the first bucket covering max_ctx
                    cover = [b for b in buckets if b >= max_ctx]
                    buckets = keep + cover[:1]
                variants = [(1, s) for s in buckets]
            else:
                buckets = self._decode_buckets()
                if max_ctx is not None and self.context_buckets:
                    need = -(-max_ctx // self.page_size)
                    keep = [b for b in buckets if b < need]
                    cover = [b for b in buckets if b >= need]
                    buckets = keep + cover[:1]
                variants = [(p, None) for p in buckets]
            # engines with a lane warm BOTH program variants per bucket:
            # the scheduler dispatches the plain program on idle-lane chunks
            lane_variants = (False, True) if self.prefill_lane else (False,)
            for p_cur, s_cur in variants:
                for lane_on in lane_variants:
                    self.rng, key = jax.random.split(self.rng)
                    samp = {k: jnp.asarray(v)
                            for k, v in self.samp_host.items()}
                    last = jnp.asarray(self.last_tok)
                    lens = jnp.asarray(self.seq_lens)
                    lane_args = ()
                    if lane_on:
                        chunk, Tp, A = (self.decode_chunk_len,
                                        self.prefill_lane, self.LANE_MAX_ACT)
                        lane_args = (
                            jnp.zeros((chunk, Tp), jnp.int32),
                            jnp.full((chunk, Tp), -1, jnp.int32),
                            jnp.zeros((chunk, p_cur), jnp.int32),
                            jnp.zeros((chunk,), jnp.int32),
                            jnp.full((A,), B, jnp.int32),
                            jnp.zeros((A,), jnp.int32),
                        )
                    if self.speculative:
                        out = self._decode_program(s_cur, spec=True)(
                            self.k_pages, self.v_pages, self.kv_aux,
                            self.params,
                            jnp.asarray(self.page_tables[:, :p_cur]),
                            self.seen, self.toks_hist,
                            last, lens, last, lens,
                            jnp.asarray(self.hist_host),
                            jnp.ones((B,), bool),
                            jnp.zeros((B,), bool), samp, key,
                            jnp.asarray(self.min_tokens),
                            jnp.asarray(self.prompt_lens),
                            *self._inject_args(),
                        )
                        (self.k_pages, self.v_pages, self.kv_aux,
                         self.seen, self.toks_hist) = out[:5]
                        continue
                    out = self._decode_program(s_cur, lane=lane_on)(
                        self.k_pages, self.v_pages, self.kv_aux, self.params,
                        jnp.asarray(self.page_tables[:, :p_cur]), self.seen,
                        last, lens, last, lens, jnp.ones((B,), bool),
                        jnp.zeros((B,), bool), samp, key,
                        jnp.asarray(self.min_tokens),
                        jnp.asarray(self.prompt_lens),
                        *self._inject_args(),
                        *lane_args,
                    )
                    # inactive rows write nothing (positions < 0 dropped);
                    # rebind the donated buffers and discard the rest
                    (self.k_pages, self.v_pages, self.kv_aux,
                     self.seen) = out[0], out[1], out[2], out[3]
            if self.chunk_trim and not self.speculative:
                # Steady-state churn serving runs at the TOP context buckets
                # (the bucket tracks the longest active row), so the
                # half-length trim program is only warmed — and therefore
                # only ever dispatched — there: two extra compiles instead
                # of a full ladder (~13s/program remote compile on axon).
                for p_cur, s_cur in variants[-2:]:
                    self.rng, key = jax.random.split(self.rng)
                    samp = {k: jnp.asarray(v)
                            for k, v in self.samp_host.items()}
                    last = jnp.asarray(self.last_tok)
                    lens = jnp.asarray(self.seq_lens)
                    out = self._decode_program(
                        s_cur, chunk_len=self._trim_chunk)(
                        self.k_pages, self.v_pages, self.kv_aux, self.params,
                        jnp.asarray(self.page_tables[:, :p_cur]), self.seen,
                        last, lens, last, lens, jnp.ones((B,), bool),
                        jnp.zeros((B,), bool), samp, key,
                        jnp.asarray(self.min_tokens),
                        jnp.asarray(self.prompt_lens),
                        *self._inject_args(),
                    )
                    (self.k_pages, self.v_pages, self.kv_aux,
                     self.seen) = out[0], out[1], out[2], out[3]
                    self._trim_warm.add((p_cur, s_cur))
            jax.block_until_ready(self.seen)
        # arm the lazy-compile detector: any program BUILT from here on is
        # a shape warmup missed (a ~12s remote-compile serving stall on
        # axon) — counted in stats["post_warmup_builds"] + warned
        self._warmed = True

    def start(self):
        if self._thread is None or not self._thread.is_alive():
            self._stopping = False
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()

    def shutdown(self):
        self._stopping = True
        self._wake.set()
        if self._thread is not None:
            self._thread.join(timeout=10)

    # ------------------------------------------------------------- scheduler

    def _loop(self):
        """Pipelined scheduler: while the host syncs + post-processes chunk N
        and admits new requests, the device is already running chunk N+1.

        Chunk N+1 is dispatched *from chunk N's device-side carry* (no host
        round trip), before N's tokens are read back. Slots whose host state
        changed in between (finished, aborted, re-admitted) are detected by
        an epoch counter and their speculative results are discarded; the
        page/prefix-cache invariants hold because the device executes
        programs in dispatch order (speculative KV writes land before any
        re-admission prefill overwrites them, and only beyond the finished
        sequence's trimmed end, which full-page prefix insertion never
        covers)."""
        while not self._stopping:
            try:
                if self._pending is None:
                    self._apply_aborts()
                    admitted = self._admit(defer=True)
                    if not any(s.active for s in self.slots) \
                            and not self._lane:
                        self._drain_inject()  # stale handles (rows aborted)
                        if not admitted:
                            self._wake.wait(timeout=0.05)
                            self._wake.clear()
                        continue
                    self._pending = self._dispatch_decode(carry=None)
                    self._drain_inject()
                    if self._pending is None and self._lane:
                        # nothing dispatchable and no chunk in flight:
                        # aborted lane entries can be reclaimed immediately
                        keep = []
                        for e in self._lane:
                            if e.get("done"):
                                continue
                            if e.get("aborted"):
                                self._abort_lane_entry(e)
                                continue
                            keep.append(e)
                        self._lane = keep
                else:
                    nxt = None
                    if self.pipeline_decode and not self._aborts \
                            and self._can_speculate(self._pending) \
                            and not self._churn_imminent(self._pending):
                        nxt = self._dispatch_decode(carry=self._pending)
                        if nxt is not None:
                            self.stats["pipelined_chunks"] += 1
                    self._drain_inject()
                    freed_before = sum(1 for s in self.slots
                                       if not s.active and s.req is None)
                    self._gap_spec = nxt is not None
                    self._process_decode(self._pending)
                    self._pending = nxt
                    self._apply_aborts()
                    freed = sum(1 for s in self.slots
                                if not s.active and s.req is None)
                    if freed > freed_before \
                            and self.refill_grace == "fixed" \
                            and self._queue.empty() and not self._deferred:
                        # r3 policy (kept for A/B): a fixed 2ms handoff
                        self._wake.wait(timeout=0.002)
                        self._wake.clear()
                    elif freed > freed_before \
                            and self.refill_grace == "adaptive":
                        # Adaptive closed-loop refill grace. Completion
                        # callbacks just fired; closed-loop clients (the
                        # agent workload: every finished turn re-enters as
                        # the next turn) resubmit from another thread, and
                        # every refill that misses this admission idles a
                        # full chunk. Break-even: waiting w costs
                        # max_slots*w row-time, a missed refill costs
                        # chunk_wall row-time — so the budget is
                        # freed * chunk_wall / max_slots (capped), and we
                        # stop early once every freed slot has a request or
                        # the arrival stream goes quiet. The old fixed 2ms
                        # could never absorb agent-mode churn (~32
                        # completions per chunk at B=96, mean turn ≈ 3
                        # chunks → occupancy 0.76 in the r4 capture).
                        n_freed = freed - freed_before
                        budget = min(0.025, n_freed * self._chunk_ema
                                     / max(self.max_slots, 1))
                        deadline = time.monotonic() + budget
                        quiet_for = 0.0
                        last_q = self._queue.qsize() + len(self._deferred)
                        while time.monotonic() < deadline:
                            if last_q >= n_freed:
                                break   # a request for every freed slot
                            self._wake.wait(timeout=0.001)
                            self._wake.clear()
                            q = self._queue.qsize() + len(self._deferred)
                            if q == last_q:
                                quiet_for += 0.001
                                if quiet_for >= 0.002:
                                    break   # client has nothing (for now)
                            else:
                                quiet_for, last_q = 0.0, q
                        self.stats["grace_wait_s"] += max(
                            0.0, time.monotonic() - deadline + budget)
                    self._admit(defer=True)
            except Exception as e:  # engine-step crash: fail in-flight work loudly
                import traceback

                traceback.print_exc()
                self._pending = None
                self._inject_handles.clear()  # slots' futures failed below
                for s in self.slots:
                    if s.future is not None and not s.future.done():
                        s.future.set_exception(e)
                    s.reset()
                for _, fut in self._deferred:
                    if not fut.done():
                        fut.set_exception(e)
                self._deferred.clear()
                self._resumes.clear()
                for le in self._lane:
                    fut = le["p"]["slot"].future
                    if fut is not None and not fut.done():
                        fut.set_exception(e)
                self._lane.clear()
                while not self._queue.empty():
                    try:
                        item = self._queue.get_nowait()
                    except queue.Empty:
                        break
                    for _, fut in (item if isinstance(item, list) else [item]):
                        if not fut.done():
                            fut.set_exception(e)
                return

    def _mark_dirty(self) -> None:
        """Host slot state changed: device copies must be re-uploaded."""
        self._host_version += 1

    def _dev(self, name: str, build):
        """Version-cached host→device upload."""
        hit = self._dev_cache.get(name)
        if hit is not None and hit[0] == self._host_version:
            return hit[1]
        val = build()
        self._dev_cache[name] = (self._host_version, val)
        return val

    def _bucket(self, n: int) -> int:
        b = 16
        while b < n:
            b *= 2
        return min(b, self.max_seq_len)

    def _free_slot(self) -> _Slot | None:
        parked = None
        for s in self.slots:
            if not s.active and s.req is None:
                if s.idx not in self._parked:
                    return s
                # prefer unparked rows so parked KV survives for re-entry;
                # fall back to the least-recently-parked row
                if parked is None or (self._parked[s.idx]["t"]
                                      < self._parked[parked.idx]["t"]):
                    parked = s
        return parked

    def _match_parked(self, prompt: list[int]) -> tuple[_Slot, int] | None:
        """Longest parked row whose stored tokens prefix-match ``prompt``.

        Token-exact: the row's KV is valid for positions < its ``usable``
        length, so the match is min(common prefix, usable, len(prompt)-1) —
        at least one prompt token must prefill to produce logits."""
        best, best_len = None, 0
        limit = len(prompt) - 1
        p = np.asarray(prompt[:limit], np.int32)
        for idx, rec in self._parked.items():
            s = self.slots[idx]
            if s.active or s.req is not None:
                continue
            toks = rec["tokens"]
            n = min(rec["usable"], limit, len(toks))
            if n <= best_len:
                continue
            eq = toks[:n] != p[:n]
            m = int(np.argmax(eq)) if eq.any() else n
            if m > best_len:
                best, best_len = s, m
        if best is None or best_len <= 0:
            return None
        return best, best_len

    def _ensure_pages(self, needed: int) -> bool:
        if self.allocator.can_alloc(needed):
            return True
        if self.prefix_cache is not None:
            self.prefix_cache.evict_lru(needed)
        return self.allocator.can_alloc(needed)

    # default prefill rows per dispatch (pow2-padded). 16 measured best for
    # burst admission on v5e (prefill 21.4k vs 15.3k tok/s at group 8; e2e
    # +8%) — groups only grow when that many same-bucket prompts are queued,
    # so small loads keep small dispatches.
    MAX_PREFILL_GROUP = 16
    # prefill-lane prompts that may COMPLETE (and sample a first token) per
    # decode chunk; more simply wait for the next chunk. Sized to the
    # steady-state churn at chunk 32 (a full batch of 128-token generations
    # finishes ~8 rows per chunk)
    LANE_MAX_ACT = 8
    # cap rows x bucket per dispatch: the fresh-prefill causal path scores
    # [G, H, T, T] in f32, so unchecked long buckets at full group width
    # exhaust HBM (16 x 2048 tokens = ~4GB of scores)
    PREFILL_TOKEN_BUDGET = 8192

    def _group_cap(self, bucket: int) -> int:
        return max(1, min(self.MAX_PREFILL_GROUP,
                          self.PREFILL_TOKEN_BUDGET // max(bucket, 1)))

    def _apply_aborts(self) -> None:
        if not self._aborts:
            return
        for s in self.slots:
            if s.active and s.req and s.req.request_id in self._aborts:
                self._aborts.discard(s.req.request_id)
                s.stop.finished, s.stop.finish_reason = True, "aborted"
                self._finish_slot(s, reason="aborted")
        if self._lane and self._aborts:
            keep = []
            for e in self._lane:
                rid = e["p"]["req"].request_id
                if not e.get("aborted") and rid in self._aborts:
                    self._aborts.discard(rid)
                    if "last_sched" not in e:
                        self._abort_lane_entry(e)   # never dispatched
                        continue
                    e["aborted"] = True   # pages freed once chunks drain
                keep.append(e)
            self._lane = keep

    def _admit(self, max_admits: int | None = None, defer: bool = False):
        """Admit queued requests with *batched prefill*.

        ``defer=True`` (admission injection): dispatch each group's prefill
        program and ACTIVATE its slots immediately, but skip the result sync
        for the newest ≤2 groups — their handles park in
        ``self._inject_handles``; the next decode dispatch reads the groups'
        first tokens device-side (:meth:`_inject_args`) and the scheduler
        syncs them afterwards (:meth:`_drain_inject`), so admission never
        stalls decode on a prefill round trip.

        Requests are prepared host-side, grouped by prompt-length bucket, and
        each group prefills in ONE batched forward — with 100 trajectories
        arriving together (the reference's --concurrent_limit pattern), this
        replaces 100 sequential prefill dispatches with ~a dozen. Bounded by
        ``admit_batch`` per scheduler iteration for decode fairness.
        """
        if max_admits is None:
            max_admits = self.admit_batch
        prepared = []
        while len(prepared) < max_admits:
            slot = self._free_slot()
            if slot is None:
                break
            if self._deferred:
                req, fut = self._deferred.pop(0)
            else:
                try:
                    item = self._queue.get_nowait()
                except queue.Empty:
                    break
                if isinstance(item, list):  # submit_many batch
                    self._deferred.extend(item)
                    continue
                req, fut = item
            if req.request_id in self._aborts:
                self._aborts.discard(req.request_id)
                self._resumes.pop(fut, None)
                fut.cancel()
                continue
            try:
                prepared.append(self._prepare_request(slot, req, fut))
            except MemoryError as e:
                slot.reset()
                prompt_need = -(-(min(len(req.prompt_ids), self.max_seq_len) + 1)
                                // self.page_size)
                if prompt_need >= self.n_pages:
                    # prompt alone can never fit — fail permanently
                    if not fut.done():
                        fut.set_exception(e)
                else:
                    # defer until in-flight sequences release pages
                    self._deferred.append((req, fut))
                    break
            except Exception as e:  # surface failures to the caller
                slot.reset()
                if not fut.done():
                    fut.set_exception(e)
        if not prepared:
            return False

        if self.prefill_lane and (any(s.active for s in self.slots)
                                  or self._lane or self._pending is not None):
            # decode is running (or about to): ride WHOLE prompts through
            # the lane (fresh-only contract: no cached prefix, fits one
            # step) up to one chunk's absorption. Everything else — long
            # prompts, prefix re-entries, overflow under churn — takes
            # batched-injected prefill, which runs at MXU rate. Cold bursts
            # (nothing active) always take the batched path.
            backlog = sum(1 for e in self._lane
                          if not e.get("aborted")
                          and e["off"] < len(e["p"]["suffix"]))
            cap = self.decode_chunk_len
            overflow = []
            for p in prepared:
                if (backlog < cap and p["cached_len"] == 0
                        and len(p["suffix"]) <= self.prefill_lane):
                    self._lane.append({"p": p, "off": 0})
                    backlog += 1
                else:
                    overflow.append(p)
            if not overflow:
                return True
            prepared = overflow

        groups: dict[int, list] = {}
        for p in prepared:
            groups.setdefault(self._bucket(max(len(p["suffix"]), 1)), []).append(p)
        # two-phase admission pipeline: dispatch every group's program
        # first (device chains them through the donated cache buffers),
        # then sync each in order — the per-dispatch tunnel round trip
        # overlaps the previous group's execution instead of serializing.
        handles = []
        for bucket, grp in sorted(groups.items()):
            cap = self._group_cap(bucket)
            for i in range(0, len(grp), cap):
                sub = grp[i : i + cap]
                try:
                    handles.append(self._prefill_group_dispatch(bucket, sub))
                except Exception as e:
                    # fail only this group's requests, not the whole engine
                    import traceback

                    traceback.print_exc()
                    for p in sub:
                        self._fail_prepared(p, e)
        if defer:
            # admission injection: activate the newest ≤n_inject groups
            # WITHOUT syncing — the next decode dispatch takes their first
            # tokens straight from the device (_inject_args) and the sync
            # then overlaps that chunk's execution. Earlier groups (bursts
            # beyond n_inject) sync here; they complete first, so the wait
            # is the same one the injected groups' programs already hide.
            room = self.n_inject - len(self._inject_handles)
            if room > 0 and handles:
                deferred, handles = handles[len(handles) - room:], \
                    handles[: len(handles) - room]
                for h in deferred:
                    for g, p in enumerate(h["grp"]):
                        if p["slot"].epoch != h["epochs"][g]:
                            continue
                        self.seq_lens[p["slot"].idx] = len(p["prompt"])
                        p["slot"].active = True
                self._mark_dirty()
                self._inject_handles.extend(deferred)
                self.stats["injected_groups"] += len(deferred)
        for h in handles:
            try:
                self._prefill_group_process(h)
            except Exception as e:
                import traceback

                traceback.print_exc()
                for p in h["grp"]:
                    self._fail_prepared(p, e)
        return True

    def _preempt_slot(self, s: _Slot) -> None:
        """Evict an active sequence under page pressure WITHOUT losing work:
        its generated tokens plus stop/stream state are parked and the
        request re-enters the admission queue as a continuation (recompute
        preemption). Full pages are inserted into the prefix cache before
        release, so the re-prefill normally re-adopts them instead of
        recomputing."""
        self.stats["preemptions"] += 1
        req, fut = s.req, s.future
        self._resumes[fut] = {
            "generated": list(s.generated),
            "stop": s.stop,
            "detok": s.detok,
            "orig_prompt": list(s.prompt_tokens),
        }
        if self.prefix_cache is not None and self.cache_mode != "slot":
            full_tokens = list(s.prompt_tokens) + list(s.generated)
            n_full = int(self.seq_lens[s.idx]) // self.page_size
            pages = (s.shared_pages + s.pages)[:n_full]
            if pages:
                self.prefix_cache.insert(full_tokens, pages)
        self.allocator.free(s.shared_pages)
        self.allocator.free(s.pages)
        self.page_tables[s.idx, :] = (
            s.idx if self.cache_mode == "slot" else 0)
        self.seq_lens[s.idx] = 0
        self._mark_dirty()
        s.reset()
        self._deferred.append((req, fut))

    def _fail_prepared(self, p: dict, exc: Exception) -> None:
        """Release a prepared-but-unprefilled request after a group failure."""
        slot = p["slot"]
        fut = slot.future
        self.allocator.free(slot.shared_pages)
        self.allocator.free(slot.pages)
        self.page_tables[slot.idx, :] = (
            slot.idx if self.cache_mode == "slot" else 0)
        self.seq_lens[slot.idx] = 0
        self._mark_dirty()
        slot.reset()
        if fut is not None and not fut.done():
            fut.set_exception(exc)

    def _prepare_request(self, slot: _Slot, req: GenerationRequest,
                         fut: Future) -> dict:
        """Host-side admission: pages, prefix match, slot state. No device
        work — the batched prefill happens in :meth:`_prefill_group`."""
        resume = self._resumes.pop(fut, None)
        if resume is not None:
            # preempted continuation: re-prefill prompt + generated-so-far
            # (normally a prefix-cache hit on the pages parked at preemption)
            prompt = resume["orig_prompt"] + resume["generated"]
            eff_tokens = max(1, req.max_tokens - len(resume["generated"]))
        else:
            prompt = list(req.prompt_ids)
            eff_tokens = req.max_tokens
        if len(prompt) >= self.max_seq_len:
            # keep the prompt tail, reserving room for generation — but never
            # let an oversized max_tokens flip the slice positive and gut the
            # prompt (reference keeps the tail too via context-overflow
            # retry halving, scripts/deep_search.py:376-379)
            eff_max = max(1, min(eff_tokens, self.max_seq_len - 1))
            keep = max(1, self.max_seq_len - eff_max - 1)
            prompt = prompt[-keep:]
        total_budget = min(len(prompt) + eff_tokens + self._max_adv,
                           self.max_seq_len)

        shared: list[int] = []
        cached_len = 0
        keep_seen, clear_ids = False, None
        if self.cache_mode == "slot":
            own: list[int] = []     # slot mode: cache row == slot row
            if self._slot_park:
                best = self._match_parked(prompt)
                if best is not None:
                    bslot, blen = best
                    if not bslot.active and bslot.req is None:
                        slot = bslot            # re-enter the parked row
                        cached_len = blen
                        self.stats["slot_park_hits"] += 1
                        self.stats["slot_park_tokens"] += blen
                        rec = self._parked.get(slot.idx)
                        # a pipelined in-flight chunk that still steps this
                        # row will scatter post-park tokens into its seen
                        # mask AFTER the host recorded the stale list (the
                        # device runs that chunk before this re-entry's
                        # prefill) — the upload path overwrites the mask so
                        # it is immune; keep-path must sit this one out
                        in_flight = (self._pending is not None
                                     and bool(self._pending["active"]
                                              [slot.idx]))
                        if self.seen_keep and rec is not None \
                                and not in_flight:
                            # reuse the row's device seen mask: clear every
                            # parked-life token NOT in the new prompt (the
                            # post-stop garbage ids recorded at park time,
                            # plus any unmatched parked tail); the prefill
                            # program ORs the suffix presence back in. The
                            # result equals presence(prompt) exactly — see
                            # _prefill_fn. Rows whose clear list outgrows
                            # the fixed program width keep the upload path.
                            cand = set(map(int, rec.get("stale", ())))
                            cand.update(map(int, rec["tokens"][blen:]))
                            pset = set(prompt)
                            ids = np.fromiter(
                                (t for t in cand if t not in pset),
                                np.int32)
                            if ids.size <= self._clear_w:
                                keep_seen, clear_ids = True, ids
                self._parked.pop(slot.idx, None)  # row is being reused
        else:
            if self.prefix_cache is not None and len(prompt) > self.page_size:
                # never match the entire prompt — at least one token must be
                # prefilled to produce next-token logits
                shared, cached_len = self.prefix_cache.match(prompt[:-1])
            n_new_pages = -(-total_budget // self.page_size) - len(shared)
            if not self._ensure_pages(n_new_pages):
                # admit with whatever fits beyond the prompt; decode-time
                # exhaustion preempts by requeue-with-recompute (SURVEY.md §5
                # failure-handling: degrade, don't crash)
                min_pages = -(-(len(prompt) + 1) // self.page_size) - len(shared)
                if self._ensure_pages(min_pages):
                    n_new_pages = max(min_pages,
                                      self.allocator.num_free // 2)
                    n_new_pages = min(n_new_pages, self.allocator.num_free)
                else:
                    if shared:
                        self.allocator.free(shared)
                    raise MemoryError("KV pages exhausted")
            own = self.allocator.alloc(max(n_new_pages, 0))

        slot.req, slot.future = req, fut
        slot.shared_pages = shared
        slot.pages = own
        slot.prompt_tokens = prompt
        slot.prompt_len = len(prompt)
        slot.cached_len = cached_len
        slot.generated = []
        eos_ids = tuple(i for i in (self.tokenizer.eos_id,) if i is not None)
        slot.stop = StopState(tuple(req.stop), eos_ids, req.max_tokens,
                              req.include_stop_str)
        from .tokenizer import IncrementalDetokenizer

        slot.detok = IncrementalDetokenizer(self.tokenizer)
        if resume is not None:
            # restore progress: token counts, stop-scanner text, stream
            # detok state all continue where preemption cut them off
            slot.prompt_tokens = resume["orig_prompt"]
            slot.prompt_len = len(resume["orig_prompt"])
            slot.generated = resume["generated"]
            slot.stop = resume["stop"]
            slot.detok = resume["detok"]

        b = slot.idx
        if self.cache_mode == "slot":
            self.page_tables[b, 0] = b
        else:
            all_pages = shared + own
            self.page_tables[b, :] = 0
            self.page_tables[b, : len(all_pages)] = all_pages
        for k, v in (("temperature", req.temperature), ("top_k", req.top_k),
                     ("top_p", req.top_p), ("min_p", req.min_p),
                     ("repetition_penalty", req.repetition_penalty)):
            self.samp_host[k][b] = v
        self.min_tokens[b] = (req.min_tokens if resume is None else
                              max(0, req.min_tokens - len(slot.generated)))
        self.prompt_lens[b] = len(prompt)
        if self.speculative:
            # n-gram draft history: the full (prompt + resumed-generation)
            # token stream at positions 0..len(prompt)-1; decode extends it
            # on device (prompt-lookup drafts come from exactly these rows)
            self.hist_host[b, : len(prompt)] = prompt
            self.hist_host[b, len(prompt):] = 0
        self._mark_dirty()
        return {"slot": slot, "req": req, "suffix": prompt[cached_len:],
                "cached_len": cached_len, "prompt": prompt,
                "pre_gen": len(slot.generated),
                "keep_seen": keep_seen, "clear_ids": clear_ids}

    @staticmethod
    def _pow2(n: int, cap: int) -> int:
        """Pad a group size up the ladder (powers of 4: 1, 4, 16, ...).

        Each distinct group shape is a jitted program — a multi-second
        remote compile on axon — so the ladder is deliberately coarse:
        padding rows do null-page work (cheap MXU waste) while a sparse
        ladder keeps the warmup set small and the lazy-compile tail short
        (r4: agent-mode serving stalled ~12s per cold prefill shape)."""
        g = 1
        while g < n:
            g *= 4
        return min(g, cap)

    def _prefill_group(self, bucket: int, grp: list[dict]) -> None:
        """One fused prefill + first-token sample for a group of same-bucket
        requests (dispatch + sync; see the split methods below)."""
        self._prefill_group_process(self._prefill_group_dispatch(bucket, grp))

    def _prefill_group_dispatch(self, bucket: int, grp: list[dict]) -> dict:
        """Dispatch one fused prefill + first-token sample program for a
        group of same-bucket requests WITHOUT syncing its results. Padding
        rows write to the null page and their seen-mask scatters are dropped
        (row index = max_slots)."""
        t0 = time.monotonic()
        G = len(grp)
        Gp = self._pow2(G, self._group_cap(bucket))

        tokens = np.zeros((Gp, bucket), np.int32)
        positions = np.full((Gp, bucket), -1, np.int32)
        tables = np.zeros((Gp, self.max_pages_per_seq), np.int32)
        seq_lens = np.zeros((Gp,), np.int32)
        logits_idx = np.zeros((Gp,), np.int32)
        rows = np.full((Gp,), self.max_slots, np.int32)  # pad rows: dropped
        # prefix-reusing engines use the non-fresh program even for
        # cached_len==0 groups (the gather path handles them; positions
        # start at 0) — ONE program variant per (bucket, group) instead of
        # two, halving the warmup set and the lazy-compile tail. Ring
        # (mesh long-prefill) still requires the fresh causal path.
        fresh = all(p["cached_len"] == 0 for p in grp)
        if fresh and (self.prefix_cache is not None or self._slot_park) \
                and not self._ring_prefill(bucket, True):
            fresh = False

        for g, p in enumerate(grp):
            slot, suffix, prompt = p["slot"], p["suffix"], p["prompt"]
            T = len(suffix)
            tokens[g, :T] = suffix
            positions[g, :T] = np.arange(p["cached_len"], p["cached_len"] + T)
            tables[g] = self.page_tables[slot.idx]
            seq_lens[g] = len(prompt)
            logits_idx[g] = max(T - 1, 0)
            rows[g] = slot.idx
        keep = np.zeros((Gp,), bool)
        derive = np.zeros((Gp,), bool)
        clear = np.full((Gp, self._clear_w), self.cfg.vocab_size, np.int32)
        if not fresh:
            for g, p in enumerate(grp):
                if p.get("keep_seen"):
                    keep[g] = True
                    self.stats["seen_keep_rows"] += 1
                    ids = p.get("clear_ids")
                    if ids is not None and ids.size:
                        clear[g, : ids.size] = ids
                elif p["cached_len"] == 0:
                    derive[g] = True   # whole prompt is in `tokens`
        zkey = ("zrows", Gp)
        zero_rows = self._dev_cache.get(zkey)
        if zero_rows is None:
            zero_rows = jnp.zeros((Gp, self.cfg.vocab_size), bool)
            self._dev_cache[zkey] = zero_rows
        if fresh or (keep[:G] | derive[:G]).all():
            # fresh/derive groups build token-presence rows on device from
            # `tokens`; park-hit re-entry groups (the agent-mode steady
            # state) from the rows' device-resident masks + clear/suffix —
            # either way ship the cached zero placeholder instead of a
            # [Gp, V] host build + upload (~0.5MB of tunnel traffic per
            # dispatch)
            seen_rows = zero_rows
        else:
            seen_np = np.zeros((Gp, self.cfg.vocab_size), bool)
            for g, p in enumerate(grp):
                if keep[g] or derive[g]:
                    continue  # mask derived on device
                ids = np.asarray(p["prompt"], np.int64)
                seen_np[g][ids[ids < self.cfg.vocab_size]] = True
            seen_rows = jnp.asarray(seen_np)

        srows = rows[:G]
        pad = lambda a: np.concatenate([a, np.repeat(a[-1:], Gp - G)]) if Gp > G else a
        samp = {k: jnp.asarray(pad(self.samp_host[k][srows]))
                for k in ("temperature", "top_k", "top_p", "min_p",
                          "repetition_penalty")}
        prefill = self._prefill_fn(
            (bucket, Gp, fresh, self._ring_prefill(bucket, fresh)))
        self.rng, sk = jax.random.split(self.rng)
        with self.spans.span("prefill_dispatch"):
            (self.k_pages, self.v_pages, self.kv_aux, self.seen,
             first) = prefill(
                self.k_pages, self.v_pages, self.kv_aux, self.params,
                jnp.asarray(tokens), jnp.asarray(positions), jnp.asarray(tables),
                jnp.asarray(seq_lens), jnp.asarray(logits_idx),
                jnp.asarray(rows), self.seen, seen_rows,
                jnp.asarray(keep), jnp.asarray(derive), jnp.asarray(clear),
                samp, jnp.asarray(pad(self.min_tokens[srows])), sk,
            )
        self.stats["prefill_dispatches"] += 1
        self.stats["prefill_rows"] += G
        # group-size health histogram: "{bucket}x{rows}" -> dispatch count.
        # Agent-mode fragmentation (many small groups, each paying the
        # dispatch RTT + [Gp,V] seen-rows upload) shows up here directly.
        hist = self.stats.setdefault("prefill_group_hist", {})
        key = f"{bucket}x{G}"
        hist[key] = hist.get(key, 0) + 1
        try:
            first.copy_to_host_async()   # stream back behind the program
        except Exception:
            pass
        return {"grp": grp, "first": first, "t0": t0,
                "epochs": [p["slot"].epoch for p in grp]}

    def _prefill_group_process(self, h: dict) -> None:
        """Sync one dispatched prefill group and fold its first tokens into
        slot state."""
        grp, t0 = h["grp"], h["t0"]
        with self.spans.span("prefill_sync"):
            first_np = np.asarray(h["first"][: len(grp)])

        n_prefill = 0
        for g, p in enumerate(grp):
            slot, prompt = p["slot"], p["prompt"]
            if slot.epoch != h["epochs"][g]:
                continue  # aborted/reset between deferred dispatch and sync
            b = slot.idx
            self.seq_lens[b] = len(prompt)
            self.last_tok[b] = int(first_np[g])
            slot.active = True
            self._process_chunk(slot, first_np[g : g + 1].astype(np.int64))
            n_prefill += len(p["suffix"])
            self.stats["requests"] += 1
            new_gen = len(slot.generated) - p.get("pre_gen", 0)
            if slot.stop.finished or len(prompt) + new_gen >= self.max_seq_len:
                self._finish_slot(slot)
        self.stats["prefill_tokens"] += n_prefill
        # union of [t0, now] with everything already counted: overlapping
        # pipelined groups contribute only their uncovered tail
        now = time.monotonic()
        self.stats["prefill_time_s"] += now - max(t0, self._prefill_clock)
        self._prefill_clock = now

    def _record_token(self, slot: _Slot, tok: int):
        piece = slot.detok.push(tok)
        slot.generated.append(tok)
        before = len(slot.stop.text)
        slot.stop.feed(tok, piece)
        cb = slot.req.on_delta if slot.req else None
        if cb is not None:
            emitted = slot.stop.text[before:]
            if emitted:
                try:
                    cb(emitted)
                except Exception:
                    pass

    def _plan_lane(self, chunk: int) -> dict:
        """Schedule pending lane requests onto this chunk's steps: each step
        carries ONE WHOLE prompt (fresh-only lane contract — admission only
        lanes requests with ``len(suffix) <= prefill_lane`` and no cached
        prefix), which also becomes an activation record (first token
        sampled in-program, slot activated at process time). Advances host
        cursors — planning is dispatch-ordered, so pipelined chunks carry
        disjoint requests."""
        Tp = self.prefill_lane
        self._chunk_seq += 1
        per_step: list[dict | None] = []
        acts: list[dict] = []
        n_tok = 0
        max_needed = 0
        ei = 0
        for step in range(chunk):
            while ei < len(self._lane) and (
                    self._lane[ei].get("aborted")
                    or self._lane[ei]["off"] >= len(self._lane[ei]["p"]["suffix"])):
                ei += 1
            if ei >= len(self._lane) or len(acts) >= self.LANE_MAX_ACT:
                per_step.append(None)
                continue
            e = self._lane[ei]
            p = e["p"]
            suffix = p["suffix"]
            take = len(suffix)
            toks = np.zeros((Tp,), np.int32)
            pos = np.full((Tp,), -1, np.int32)
            toks[:take] = suffix
            pos[:take] = np.arange(take)
            e["off"] = take
            e["last_sched"] = self._chunk_seq
            n_tok += take
            per_step.append({"slot": p["slot"].idx, "toks": toks, "pos": pos,
                             "row": take - 1})
            max_needed = max(max_needed, take + 1)
            acts.append({"i": len(acts), "step": step,
                         "slot": p["slot"].idx, "entry": e,
                         "epoch": p["slot"].epoch})
        return {"steps": [s for s in per_step if s is not None],
                "per_step": per_step, "acts": acts, "n_tokens": n_tok,
                "max_tokens_needed": max_needed}

    def _lane_arrays(self, plan: dict, chunk: int, p_cur: int) -> tuple:
        """Materialize a lane plan as the decode program's lane inputs."""
        Tp = self.prefill_lane
        A = self.LANE_MAX_ACT
        toks = np.zeros((chunk, Tp), np.int32)
        pos = np.full((chunk, Tp), -1, np.int32)
        tabs = np.zeros((chunk, p_cur), np.int32)
        rows = np.zeros((chunk,), np.int32)
        for step, s in enumerate(plan["per_step"]):
            if s is None:
                continue
            toks[step] = s["toks"]
            pos[step] = s["pos"]
            tabs[step] = self.page_tables[s["slot"], :p_cur]
            rows[step] = s["row"]
        act_slots = np.full((A,), self.max_slots, np.int32)
        act_steps = np.zeros((A,), np.int32)
        for a in plan["acts"]:
            act_slots[a["i"]] = a["slot"]
            act_steps[a["i"]] = a["step"]
        return (jnp.asarray(toks), jnp.asarray(pos), jnp.asarray(tabs),
                jnp.asarray(rows), jnp.asarray(act_slots),
                jnp.asarray(act_steps))

    def _abort_lane_entry(self, e: dict) -> None:
        p = e["p"]
        slot = p["slot"]
        fut = slot.future
        self.allocator.free(slot.shared_pages)
        self.allocator.free(slot.pages)
        self.page_tables[slot.idx, :] = (
            slot.idx if self.cache_mode == "slot" else 0)
        self.seq_lens[slot.idx] = 0
        self._mark_dirty()
        slot.reset()
        if fut is not None and not fut.done():
            fut.cancel()

    def _can_speculate(self, h: dict) -> bool:
        """Worth dispatching chunk N+1 before syncing N? Only if some slot is
        certain to still want tokens after the outstanding chunk (otherwise
        the speculative chunk is pure waste at drain time)."""
        chunk, adv = self.decode_chunk_len, self._max_adv
        if any(not e.get("aborted") and e["off"] < len(e["p"]["suffix"])
               for e in self._lane):
            return True  # lane work keeps a speculative chunk productive
        for s in self.slots:
            if not s.active or not h["active"][s.idx] \
                    or h["epochs"][s.idx] != s.epoch:
                continue
            if s.stop.max_tokens - s.stop.n_tokens > adv \
                    and int(self.seq_lens[s.idx]) + 2 * adv < self.max_seq_len:
                return True
        return False

    def _churn_imminent(self, h: dict) -> bool:
        """Will too many slots complete during the outstanding chunk? If
        so, skip the speculative dispatch: a speculated chunk is traced
        before the completions are processed, so each freed slot (and its
        closed-loop refill) rides it inactive — one whole idle chunk per
        refill.

        The break-even is a COUNT, not any-row: skipping exposes the
        dispatch round trip to the WHOLE batch (max_slots * rtt row-time)
        while speculating idles only the completing rows (n * chunk_wall
        row-time each), so speculation wins while
        n <= max_slots * rtt / chunk_wall. The r3 any-row rule turned
        pipelining off for nearly every sustained-mode chunk (staggered
        max_tokens complete a few rows per chunk) — each paying an
        exposed ~35ms tunnel round trip to avoid idling one or two rows.
        ``churn_rtt_s`` is the assumed dispatch round trip; the chunk wall
        EMA is measured. Rows near the sequence-length cap count as
        completing (they are deactivated at the next dispatch)."""
        adv = self._max_adv
        n = 0
        for s in self.slots:
            if not s.active or not h["active"][s.idx] \
                    or h["epochs"][s.idx] != s.epoch:
                continue
            if s.stop.max_tokens - s.stop.n_tokens <= adv \
                    or int(self.seq_lens[s.idx]) + 2 * adv \
                    >= self.max_seq_len:
                n += 1
        if n == 0:
            return False
        if self._chunk_ema <= 0.0:   # no chunk timed yet: static estimate
            return n > max(1, self.max_slots // 16)
        # prefer the MEASURED exposed gap (what skipping actually costs the
        # whole batch on this workload) over the static churn_rtt_s guess;
        # churn_rtt_s == 0 stays an explicit "skip on any completing row"
        # override (probe_churn A/B contract)
        rtt = self._gap_ema if (self._gap_ema > 0.0
                                and self.churn_rtt_s > 0.0) \
            else self.churn_rtt_s
        return n > self.max_slots * rtt / self._chunk_ema

    def _inject_args(self, inject: tuple = ()) -> tuple:
        """Admission-injection inputs for the decode program: up to
        ``n_inject`` dispatched-but-unsynced prefill groups whose first-token
        device arrays feed the chunk directly (rows=max_slots → scatter
        dropped)."""
        MAXG = self.MAX_PREFILL_GROUP
        N = self.n_inject
        if getattr(self, "_inject_zero", None) is None:
            self._inject_zero = jnp.zeros((MAXG,), jnp.int32)
        rows = np.full((N, MAXG), self.max_slots, np.int32)
        toks = [self._inject_zero] * N
        for gi, h in enumerate(inject[:N]):
            for g, p in enumerate(h["grp"]):
                if p["slot"].epoch != h["epochs"][g]:
                    continue  # row reset since admit: leave dropped
                rows[gi, g] = p["slot"].idx
            toks[gi] = h["first"]
        return (jnp.asarray(rows), tuple(toks))

    def _drain_inject(self) -> None:
        """Sync every admission-injected prefill group. MUST be called after
        each _dispatch_decode attempt: a handle may only be injected into one
        chunk (the chunk's carry then holds the rows' live state, so a second
        injection would clobber it with the stale first token)."""
        handles, self._inject_handles = self._inject_handles, []
        for h in handles:
            try:
                self._prefill_group_process(h)
            except Exception as e:
                import traceback

                traceback.print_exc()
                for p in h["grp"]:
                    self._fail_prepared(p, e)

    def _dispatch_decode(self, carry: dict | None) -> dict | None:
        """Dispatch one decode chunk; returns a handle for _process_decode.

        ``carry`` is the still-unprocessed previous handle: its device-side
        last_tok/seq_lens feed this dispatch directly (no host round trip).
        Rows whose host state is authoritative (inactive at the carry's
        dispatch, or reset since — epoch mismatch) are patched from the host
        arrays. Returns None instead of dispatching when speculation can't
        proceed (page headroom would need a preemption decision that must
        wait for the carry's results)."""
        t_prep = time.monotonic()
        chunk = self.decode_chunk_len
        adv = self._max_adv   # worst-case device advance per chunk (> chunk
        #                       under speculation: each step emits up to K+1)
        valid = np.zeros((self.max_slots,), bool)
        if carry is not None:
            for s in self.slots:
                valid[s.idx] = (s.active and carry["active"][s.idx]
                                and carry["epochs"][s.idx] == s.epoch)
        # host view of each sequence's length after the outstanding chunk
        # (the carry records its own advance: it may be a trimmed chunk)
        carry_adv = carry["adv"] if carry is not None else 0
        predicted = self.seq_lens + np.where(valid, carry_adv, 0)
        active = np.array([s.active for s in self.slots], bool)
        # never dispatch a row whose positions could exceed the page budget:
        # write_kv_flat clamps out-of-range page lookups, which would land
        # junk inside the sequence's last page (prefix-cache poison)
        active &= predicted + adv + 1 <= self.max_seq_len

        # page headroom for this chunk (paged mode only)
        for s in self.slots:
            if not active[s.idx] or self.cache_mode == "slot":
                continue
            need_pages = -(-int(predicted[s.idx] + adv + 1) // self.page_size)
            have = len(s.shared_pages) + len(s.pages)
            if need_pages > have:
                extra = need_pages - have
                if not self._ensure_pages(extra):
                    if carry is not None:
                        # decide preemption after syncing carry; the host
                        # prep done so far still counts toward the
                        # inter-chunk constant
                        self.spans.add("decode_prep",
                                       time.monotonic() - t_prep)
                        return None
                    if sum(1 for x in self.slots if x.active) > 1:
                        # requeue behind the survivors; their freed pages
                        # will admit it again with all progress kept
                        self._preempt_slot(s)
                    else:
                        # nothing else will ever free pages — terminate
                        self._finish_slot(s, reason="length")
                        self.stats["preemptions"] += 1
                    active[s.idx] = False
                    continue
                new = self.allocator.alloc(extra)
                self.page_tables[s.idx, have : have + extra] = new
                s.pages.extend(new)
                self._mark_dirty()

        lane_plan = self._plan_lane(chunk) if self.prefill_lane else None
        if not active.any() and (lane_plan is None or not lane_plan["steps"]):
            self.spans.add("decode_prep", time.monotonic() - t_prep)
            return None
        # context-bucketed page table: the XLA attention path gathers all P
        # passed pages per layer, so slice to a pow2 bucket covering the
        # longest active sequence (+ this chunk) — early decode then moves
        # 2-4x less HBM traffic. jit re-specializes per width (precompiled
        # by warmup()).
        p_cur = self.max_pages_per_seq
        s_cur = None
        if self.context_buckets:
            need = int(np.max(np.where(active, predicted, 0), initial=0)) \
                + adv + 1
            if lane_plan is not None:
                need = max(need, lane_plan["max_tokens_needed"])
            if self.cache_mode == "slot":
                # slot mode buckets by pool-slice width instead of table
                # width: one jitted program per token bucket
                for b in self._slot_buckets():
                    if b >= need:
                        s_cur = b
                        break
            else:
                need_pages = -(-need // self.page_size)
                for b in self._decode_buckets():
                    if b >= need_pages:
                        p_cur = b
                        break

        # chunk-length trim: when some row is within half a chunk of its
        # known max_tokens completion, dispatch the half-length program —
        # the row then rides at most half a chunk inactive instead of a
        # full one (bucket/page math above stays sized to the full chunk:
        # strictly conservative). Gated on the bucket's half program having
        # been compiled by warmup(); EOS/stop-sequence completions are not
        # predictable and keep the full chunk.
        if self.chunk_trim and (p_cur, s_cur) in self._trim_warm:
            half = self._trim_chunk
            n_near = 0
            for s in self.slots:
                if not active[s.idx]:
                    continue
                done = s.stop.n_tokens + (
                    carry_adv if (carry is not None and valid[s.idx]) else 0)
                if 0 < s.stop.max_tokens - done <= half:
                    n_near += 1
            # amortization gate (r5): trimming splits one chunk in two, so
            # it pays one extra exposed gap; only trim when enough rows'
            # waste is saved — n rows each save ~half steps of row-time,
            # the batch pays one gap: n * half * step_wall >= gap * slots.
            # trim_min_rows overrides (1 = the r4 always-trim, for A/B).
            if self.trim_min_rows is not None:
                thr = self.trim_min_rows
            elif self._chunk_ema > 0.0:
                gap = self._gap_ema if self._gap_ema > 0.0 \
                    else self.churn_rtt_s
                step_wall = self._chunk_ema / self.decode_chunk_len
                thr = gap * self.max_slots / max(half * step_wall, 1e-9)
            else:
                thr = self.max_slots // 8
            if n_near >= thr:
                chunk = half
                self.stats["trim_chunks"] += 1

        host_last = jnp.asarray(self.last_tok)
        host_lens = jnp.asarray(self.seq_lens)
        if carry is None:
            last, lens = host_last, host_lens
            use_host = np.ones((self.max_slots,), bool)
        else:
            last, lens = carry["last"], carry["lens"]
            use_host = ~valid  # rows admitted/reset since the carry dispatch

        self.rng, key = jax.random.split(self.rng)
        samp = self._dev("samp", lambda: {
            k: jnp.asarray(v) for k, v in self.samp_host.items()})
        tables = self._dev(f"tables_{p_cur}",
                           lambda: jnp.asarray(self.page_tables[:, :p_cur]))
        min_toks = self._dev("min_tokens", lambda: jnp.asarray(self.min_tokens))
        plens = self._dev("prompt_lens", lambda: jnp.asarray(self.prompt_lens))
        act_first = None
        cnts = None
        inj = self._inject_args(tuple(self._inject_handles))
        # host-side per-chunk prep (page headroom, bucket choice, arg
        # uploads): the other half of the inter-chunk host constant —
        # decode_merge covers the post-sync half
        self.spans.add("decode_prep", time.monotonic() - t_prep)
        # idle-lane chunks dispatch the plain program — the lane variant's
        # extra rows cost ~9%/step even with nothing to prefill (r4 A/B)
        lane_on = bool(lane_plan and lane_plan["steps"])
        if self.speculative:
            hist_host = self._dev("hist", lambda: jnp.asarray(self.hist_host))
            with self.spans.span("decode_dispatch"):
                (self.k_pages, self.v_pages, self.kv_aux, self.seen,
                 self.toks_hist, last, lens, toks, cnts) = \
                    self._decode_program(s_cur, spec=True)(
                        self.k_pages, self.v_pages, self.kv_aux, self.params,
                        tables, self.seen, self.toks_hist,
                        last, lens, host_last, host_lens, hist_host,
                        jnp.asarray(use_host), jnp.asarray(active), samp, key,
                        min_toks, plens, *inj,
                    )
        elif lane_on:
            la = self._lane_arrays(lane_plan, chunk, p_cur)
            with self.spans.span("decode_dispatch"):
                (self.k_pages, self.v_pages, self.kv_aux, self.seen, last,
                 lens, toks, act_first) = self._decode_program(
                     s_cur, lane=True)(
                        self.k_pages, self.v_pages, self.kv_aux, self.params,
                        tables, self.seen,
                        last, lens, host_last, host_lens,
                        jnp.asarray(use_host), jnp.asarray(active), samp, key,
                        min_toks, plens, *inj, *la,
                    )
        else:
            trim = chunk if chunk != self.decode_chunk_len else None
            with self.spans.span("decode_dispatch"):
                (self.k_pages, self.v_pages, self.kv_aux, self.seen, last,
                 lens, toks) = self._decode_program(s_cur, chunk_len=trim)(
                        self.k_pages, self.v_pages, self.kv_aux, self.params,
                        tables, self.seen,
                        last, lens, host_last, host_lens,
                        jnp.asarray(use_host), jnp.asarray(active), samp, key,
                        min_toks, plens, *inj,
                    )
        self.stats["slot_steps"] += int(active.sum()) * chunk
        # start the host copies NOW: the transfers queue behind the chunk's
        # execution and stream back while the host does other work, so the
        # sync in _process_decode finds the bytes already (or nearly) home.
        # Matters most on the non-pipelined (churn) path, where the readback
        # RTT is otherwise fully exposed device-idle time.
        for arr in (toks, last, lens, cnts, act_first):
            if arr is not None:
                try:
                    arr.copy_to_host_async()
                except Exception:
                    break   # backend without async copies: sync path intact
        if self._gap_armed:
            self._gap_armed = False
            if carry is None:
                gap = (time.monotonic() - self._gap_t0) - (
                    self.spans.totals.get("prefill_dispatch", 0.0)
                    - self._gap_pf0)
                # >0.5s means the engine sat idle waiting for clients, not
                # scheduler overhead — don't poison the EMA with think time
                if 0.0 < gap < 0.5:
                    self._gap_ema = gap if self._gap_ema == 0.0 \
                        else 0.8 * self._gap_ema + 0.2 * gap
                    self.spans.add("exposed_gap", gap)
        return {
            "active": active,
            "chunk": chunk,
            "adv": self._max_adv if self.speculative else chunk,
            "epochs": [s.epoch for s in self.slots],
            "last": last, "lens": lens, "toks": toks, "cnts": cnts,
            "act_first": act_first,
            "acts": lane_plan["acts"] if lane_plan else [],
            "lane_tokens_n": lane_plan["n_tokens"] if lane_plan else 0,
            "chunk_id": self._chunk_seq,
            "t_dispatch": time.monotonic(),
        }

    def _process_decode(self, h: dict) -> None:
        spec = h.get("cnts") is not None
        with self.spans.span("decode_sync"):
            toks_np = np.asarray(h["toks"])   # the host↔device sync point
            last_np = np.asarray(h["last"])
            lens_np = np.asarray(h["lens"])
            cnts_np = np.asarray(h["cnts"]) if spec else None
        n_new = 0
        t_merge = time.monotonic()
        for s in self.slots:
            if not s.active or not h["active"][s.idx] \
                    or h["epochs"][s.idx] != s.epoch:
                if h["active"][s.idx] and self._slot_park:
                    # the program still stepped this row (active at
                    # dispatch); if the row parked in the meantime, its
                    # device seen mask absorbed this chunk's sampled
                    # tokens too — fold them into the stale record so a
                    # later keep-path re-entry stays exact
                    rec = self._parked.get(s.idx)
                    if rec is not None:
                        if spec:
                            c = cnts_np[s.idx]
                            w = toks_np[s.idx]
                            extra = w[np.arange(w.shape[1])[None, :]
                                      < c[:, None]]
                        else:
                            extra = toks_np[s.idx]
                        rec["stale"] = np.union1d(
                            np.asarray(rec.get("stale", ()), np.int32),
                            np.asarray(extra, np.int32))
                continue  # finished/aborted/re-admitted since dispatch
            self.last_tok[s.idx] = last_np[s.idx]
            self.seq_lens[s.idx] = lens_np[s.idx]
            if spec:
                # variable emission: flatten the [chunk, K+1] window tokens
                # by each step's accepted count (row-major mask keeps order)
                c = cnts_np[s.idx]                       # [chunk]
                wins = toks_np[s.idx]                    # [chunk, K+1]
                emitted = int(c.sum())
                arr = wins[np.arange(wins.shape[1])[None, :] < c[:, None]]
            else:
                emitted = h.get("chunk", self.decode_chunk_len)
                arr = toks_np[s.idx]
            consumed = self._process_chunk(s, arr)
            n_new += consumed
            if s.stop.finished:
                # trim over-generated tokens: KV past the true end is masked
                # by seq_lens so no cleanup is needed on device
                self.seq_lens[s.idx] -= emitted - consumed
                idx = s.idx
                self._finish_slot(s)
                rec = self._parked.get(idx) if self._slot_park else None
                if rec is not None and consumed < len(arr):
                    # post-stop sampled tokens were scattered into the
                    # row's device seen mask by the chunk program; record
                    # them so a keep-path re-entry can clear the ones not
                    # in its new prompt (exact mask reuse, _prefill_fn)
                    rec["stale"] = np.unique(
                        np.asarray(arr[consumed:], np.int32))
            elif self.seq_lens[s.idx] + self._max_adv >= self.max_seq_len:
                self._finish_slot(s, reason="length")
        if h.get("acts"):
            act_np = np.asarray(h["act_first"])
            for a in h["acts"]:
                e = a["entry"]
                p = e["p"]
                s = p["slot"]
                if e.get("aborted") or s.epoch != a["epoch"] or s.req is None:
                    continue
                first = act_np[a["i"] : a["i"] + 1].astype(np.int64)
                self.seq_lens[s.idx] = len(p["prompt"])
                self.last_tok[s.idx] = int(first[0])
                s.active = True
                self._mark_dirty()
                self._process_chunk(s, first)
                self.stats["requests"] += 1
                self.stats["prefill_tokens"] += len(p["suffix"])
                if s.stop.finished \
                        or len(p["prompt"]) + 1 >= self.max_seq_len:
                    self._finish_slot(s)
                e["done"] = True
        if self._lane:
            keep = []
            for e in self._lane:
                if e.get("done"):
                    continue
                if e.get("aborted") and e.get("last_sched", -1) <= h["chunk_id"]:
                    self._abort_lane_entry(e)   # no in-flight chunk touches it
                    continue
                keep.append(e)
            self._lane = keep
        self.stats["lane_tokens"] += h.get("lane_tokens_n", 0)
        now = time.monotonic()
        # host-side merge cost (token fold + completion handling after the
        # sync): the last unquantified constant in the sustained-mode
        # per-chunk anatomy
        self.spans.add("decode_merge", now - t_merge)
        self.stats["decode_tokens"] += n_new
        self.stats["decode_steps"] += 1
        # pipelined accounting: busy time is the union of [dispatch, sync]
        # windows, so back-to-back chunks don't double-count overlap
        busy = now - max(h["t_dispatch"], self._last_decode_end)
        self.stats["decode_time_s"] += busy
        if busy > self.stats.get("max_chunk_s", 0.0):
            self.stats["max_chunk_s"] = busy   # worst single-chunk stall
        self._last_decode_end = now
        self._chunk_ema = busy if self._chunk_ema == 0.0 \
            else 0.8 * self._chunk_ema + 0.2 * busy
        # arm the exposed-gap measurement: if the NEXT dispatch is
        # non-pipelined (this chunk had no speculative successor — the loop
        # sets _gap_spec before calling us), the time from here to that
        # dispatch returning is device-idle overhead. Only arm while slots
        # remain active: a drained batch waits on CLIENTS, and folding that
        # think time into the EMA would inflate the churn threshold into
        # speculating through heavy churn (refills then idle whole chunks)
        if not self._gap_spec and any(s.active for s in self.slots):
            self._gap_armed = True
            self._gap_t0 = now
            self._gap_pf0 = self.spans.totals.get("prefill_dispatch", 0.0)

    def _process_chunk(self, s: _Slot, arr: np.ndarray) -> int:
        """Fold one chunk of sampled tokens into slot state; returns tokens
        consumed (including a terminating EOS).

        Fast path (no custom stop strings, no streaming): pure numpy — no
        per-token Python detokenization, which otherwise dominates host time
        at high batch (text is decoded once at finish).
        """
        st = s.stop
        if st.stop_sequences or (s.req and s.req.on_delta):
            for j in range(len(arr)):
                self._record_token(s, int(arr[j]))
                if st.finished:
                    return j + 1
            return len(arr)

        room = st.max_tokens - st.n_tokens
        take = arr[: max(room, 0)]
        if st.eos_ids:
            hits = np.isin(take, np.asarray(st.eos_ids))
            if hits.any():
                cut = int(np.argmax(hits))
                s.generated.extend(int(t) for t in take[:cut])
                st.n_tokens += cut + 1
                st.finished, st.finish_reason = True, "stop"
                return cut + 1
        s.generated.extend(int(t) for t in take)
        st.n_tokens += len(take)
        if st.n_tokens >= st.max_tokens:
            st.finished, st.finish_reason = True, "length"
        return len(take)

    def _finish_slot(self, slot: _Slot, reason: str | None = None):
        req, fut = slot.req, slot.future
        st = slot.stop
        finish = reason or st.finish_reason or "stop"
        gen_ids = list(slot.generated)
        if not st.text and gen_ids and not st.stop_sequences:
            # fast path defers detokenization to completion time
            st.text = self.tokenizer.decode(gen_ids)
        # strip tokens beyond the stop point for the id list (text already cut)
        result = GenerationResult(
            request_id=req.request_id,
            token_ids=gen_ids,
            text=st.text,
            finish_reason=finish,
            prompt_tokens=slot.prompt_len,
            completion_tokens=st.n_tokens,
            cached_prompt_tokens=slot.cached_len,
        )
        # insert finished sequence into the prefix cache (full pages only)
        if self.prefix_cache is not None and self.cache_mode != "slot":
            full_tokens = list(slot.prompt_tokens) + gen_ids
            n_full = int(self.seq_lens[slot.idx]) // self.page_size
            all_pages = (slot.shared_pages + slot.pages)[:n_full]
            if all_pages:
                self.prefix_cache.insert(full_tokens, all_pages)
        if self._slot_park and finish != "aborted":
            # park the row's KV for multi-turn re-entry. usable is
            # conservative by one token: the final kept token's KV is only
            # written when it is FED (the step after sampling), which a
            # chunk boundary can cut off.
            toks = np.asarray(list(slot.prompt_tokens) + gen_ids, np.int32)
            usable = slot.prompt_len + max(len(gen_ids) - 1, 0)
            self._parked[slot.idx] = {"tokens": toks, "usable": usable,
                                      "t": time.monotonic()}
        self.allocator.free(slot.shared_pages)
        self.allocator.free(slot.pages)
        self.page_tables[slot.idx, :] = (slot.idx if self.cache_mode == "slot" else 0)
        self.seq_lens[slot.idx] = 0
        self._mark_dirty()
        slot_fut = fut
        slot.reset()
        if slot_fut is not None and not slot_fut.done():
            slot_fut.set_result(result)

    # ---------------------------------------------------------------- helpers

    def telemetry(self) -> dict:
        out = dict(self.stats)
        out["spans"] = self.spans.summary()
        if self.prefix_cache is not None:
            out["prefix_cache"] = self.prefix_cache.stats()
        if out["decode_time_s"] > 0:
            out["decode_tokens_per_s"] = out["decode_tokens"] / out["decode_time_s"]
        if self.speculative and out["slot_steps"] > 0:
            # tokens emitted per verify step; 1.0 = no accepted drafts,
            # spec_k+1 = every draft accepted (slot_steps counts dispatched
            # row-steps = forward passes, same meaning as non-spec engines)
            out["spec_tokens_per_step"] = (out["decode_tokens"]
                                           / out["slot_steps"])
        if self._gap_ema > 0.0:
            out["exposed_gap_ema_ms"] = round(self._gap_ema * 1000, 2)
        return out
