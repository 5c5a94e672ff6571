"""Continuous-batching scheduler for the local decoder.

The leader/follower coalescer in chat/local.py batches concurrent prompts
into ONE prefill + full-length decode: requests arriving mid-generation wait
for the whole scan (up to max_new_tokens steps), and a request that emits
EOS at token 3 still occupies its row to the end. This module replaces that
with iteration-level scheduling over S persistent decode SLOTS — the
standard continuous-batching design (vLLM/Orca), shaped for XLA's
static-shape compilation model:

- the serving state (KV cache [S, max_len, ...], per-slot position / done /
  sampling-key / next-token logits) lives ON DEVICE and is threaded through
  donated jit calls — no reallocation, no host round-trips for state,
- **join**: a new request prefills at its own prompt bucket (batch-1, the
  already-compiled prefill executable) and is spliced into a free slot with
  one dispatch (decoder.insert_slot),
- **decode** runs in CHUNKS of T steps (decoder.decode_chunk, a lax.scan):
  admission latency is one chunk (~T x step) instead of one generation,
  and the only per-chunk readback is the [S, T] token block. T trades
  admission latency against readback amortization; positions are tracked
  host-side (they advance deterministically), so no state readback is ever
  needed,
- **leave**: EOS frees a slot at the next chunk boundary; the host truncates
  at the request's budget and retires the slot (decoder.retire-via-done).
  Freed slots admit queued requests immediately,
- the attention read window per chunk is the max live position rounded up
  to 128 lanes (the same blocked-read bound generate() uses), so early
  generations stream proportionally less cache; one executable per
  (attend bucket) — at most max_len/128 variants,
- per-slot sampling keys make temperature>0 reproducible PER REQUEST
  (seeded from the prompt), independent of batch composition — the
  contract chat/local.py serialized sampled requests to keep; here they
  batch freely.

Isolation invariant (tests/test_serving.py): a slot's token stream is a
pure function of its own prompt/seed — attention is row-local, so batch
composition can never change a request's answer. Greedy streams are
bit-identical to decoder.generate() at the same attend window.

Reference anchor: no counterpart — the reference's chat is remote HTTPS
(GeminiChatClient.cs); this is serving depth for the on-device stack.
"""

from __future__ import annotations

import logging
import threading
from dataclasses import dataclass, field

import numpy as np

logger = logging.getLogger(__name__)


@dataclass
class _Request:
    toks: list[int]           # BOS + prompt bytes (already truncated)
    seed: int
    max_new: int
    event: threading.Event = field(default_factory=threading.Event)
    tokens: list[int] = field(default_factory=list)  # emitted (pre-EOS)
    err: Exception | None = None
    done: bool = False


class ContinuousBatcher:
    """S-slot continuous-batching decode loop over models/decoder.py.

    submit() enqueues and wakes the scheduler thread; the scheduler admits
    requests into free slots (prefill + splice), runs T-step decode chunks
    while any slot is live, and retires slots on EOS or budget. All device
    work happens on the scheduler thread — jit executables are reused, and
    the serving-state arrays are donated through every call."""

    def __init__(self, dec_module, jax_module, params, cfg, *,
                 slots: int = 4, chunk: int = 16,
                 temperature: float = 0.0,
                 prompt_buckets=(128, 256, 512),
                 prefill_chunk: int = 0,
                 prefill_budget: int = 0) -> None:
        self._dec = dec_module
        self._jax = jax_module
        self.params = params
        self.cfg = cfg
        self.slots = int(slots)
        self.chunk = int(chunk)
        self.temperature = float(temperature)
        self._buckets = tuple(prompt_buckets)
        # CHUNKED PREFILL (0 = whole-prompt): admission advances one
        # prefill_chunk-token block per scheduler iteration, interleaved
        # with decode chunks, so a long prompt's prefill stalls in-flight
        # decodes by at most one block instead of the whole prompt.
        # Cross-block attention reads the bf16 cache (decode-grade
        # numerics, see decoder.prefill_block) — opt-in because the greedy
        # bit-equality-to-generate() contract holds only for whole-prompt
        # prefill.
        self.prefill_chunk = max(0, int(prefill_chunk))
        # per-ITERATION prefill budget (0 = unlimited): at most this many
        # blocks advance per scheduler iteration across ALL in-progress
        # admissions, round-robin — with many simultaneous long-prompt
        # admissions the decode stall per iteration stays one budget's
        # worth instead of one block per admission.
        self.prefill_budget = max(0, int(prefill_budget))
        self._admissions: list[dict] = []   # in-progress chunked prefills
        self._adm_rr = 0                    # round-robin cursor (budgeted)
        self._reserved: set[int] = set()    # slots held by admissions
        self._cond = threading.Condition()
        self._pending: list[_Request] = []
        self._active: list[_Request | None] = [None] * self.slots
        self._host_pos = [0] * self.slots   # upper bound on device pos
        self._state = None                  # device serving state
        self._thread: threading.Thread | None = None
        self._stop = False

    # -- public --

    def submit(self, toks: list[int], seed: int, max_new: int) -> _Request:
        req = _Request(toks=list(toks), seed=int(seed), max_new=int(max_new))
        with self._cond:
            if self._thread is None:
                self._thread = threading.Thread(
                    target=self._loop, daemon=True, name="chat-continuous"
                )
                self._thread.start()
            self._pending.append(req)
            self._cond.notify_all()
        return req

    def generate_sync(self, toks: list[int], seed: int, max_new: int) -> list[int]:
        req = self.submit(toks, seed, max_new)
        req.event.wait()
        if req.err is not None:
            raise req.err
        return req.tokens

    def shutdown(self) -> None:
        with self._cond:
            self._stop = True
            self._cond.notify_all()

    # -- scheduler internals (single thread; owns the device state) --

    def _bucket_for(self, n_tokens: int, max_new: int) -> int:
        return next(
            (b for b in self._buckets
             if b >= n_tokens and b + max_new <= self.cfg.max_len),
            self.cfg.max_len - max_new,
        )

    def _init_state(self):
        jnp = self._jax.numpy
        cfg, s = self.cfg, self.slots
        cache = self._dec.init_cache(cfg, s)
        return {
            "cache": cache,
            "logits": jnp.zeros((s, cfg.vocab_size), jnp.float32),
            "pos": jnp.zeros((s,), jnp.int32),
            "done": jnp.ones((s,), bool),  # empty slots emit PAD
            "kv": jnp.zeros((s, cfg.max_len), bool),
            "keys": jnp.zeros((s, 2), jnp.uint32),
        }

    def _admit(self, slot: int, req: _Request) -> None:
        dec, jax, cfg = self._dec, self._jax, self.cfg
        bucket = self._bucket_for(len(req.toks), req.max_new)
        prompt = dec.pad_left_batch([req.toks], bucket)
        logits0, pcache = dec.prefill(self.params, prompt, cfg)
        st = self._state
        (st["cache"], st["kv"], st["logits"], st["pos"], st["done"],
         st["keys"]) = dec.insert_slot(
            st["cache"], st["kv"], st["logits"], st["pos"], st["done"],
            st["keys"], pcache, logits0, prompt,
            jax.random.PRNGKey(req.seed), np.int32(slot), cfg,
        )
        self._active[slot] = req
        self._host_pos[slot] = bucket

    def _begin_admission(self, slot: int, req: _Request) -> None:
        """Chunked-prefill admission: reserve the slot and stage a fresh
        batch-1 cache; _step_admissions advances one block per scheduler
        iteration and splices on completion."""
        dec, jnp, cfg = self._dec, self._jax.numpy, self.cfg
        bucket = self._bucket_for(len(req.toks), req.max_new)
        prompt = dec.pad_left_batch([req.toks], bucket)
        self._reserved.add(slot)
        self._admissions.append({
            "req": req, "slot": slot, "prompt": prompt, "bucket": bucket,
            "pcache": dec.init_cache(cfg, 1),
            "first_real": jnp.asarray(
                [bucket - min(len(req.toks), bucket)], jnp.int32
            ),
            "next": 0, "logits": None,
        })

    def _step_admissions(self) -> None:
        """Advance in-progress admissions by ONE prefill block each — at
        most ``prefill_budget`` blocks total this iteration (0 = all),
        round-robin so every admission makes progress; splice completed
        ones into their reserved slot."""
        dec, jax, cfg = self._dec, self._jax, self.cfg
        n = len(self._admissions)
        budget = self.prefill_budget or n
        # rotate so the budgeted prefix starts at the round-robin cursor
        order = [(self._adm_rr + i) % n for i in range(n)]
        self._adm_rr = (self._adm_rr + budget) % max(1, n)
        advanced, still = set(order[:budget]), []
        for i, adm in enumerate(self._admissions):
            req = adm["req"]
            if i in advanced:
                try:
                    t = min(self.prefill_chunk, adm["bucket"] - adm["next"])
                    block = adm["prompt"][:, adm["next"]:adm["next"] + t]
                    adm["logits"], adm["pcache"] = dec.prefill_block(
                        self.params, adm["pcache"], block, adm["first_real"],
                        cfg, adm["next"],
                    )
                    adm["next"] += t
                except Exception as exc:
                    logger.exception("chunked admission failed")
                    self._reserved.discard(adm["slot"])
                    req.err = exc
                    req.event.set()
                    continue
            if adm["next"] < adm["bucket"]:
                still.append(adm)
                continue
            slot = adm["slot"]
            st = self._state
            (st["cache"], st["kv"], st["logits"], st["pos"], st["done"],
             st["keys"]) = dec.insert_slot(
                st["cache"], st["kv"], st["logits"], st["pos"], st["done"],
                st["keys"], adm["pcache"], adm["logits"], adm["prompt"],
                jax.random.PRNGKey(req.seed), np.int32(slot), cfg,
            )
            self._reserved.discard(slot)
            self._active[slot] = req
            self._host_pos[slot] = adm["bucket"]
        self._admissions = still

    def _run_chunk(self) -> None:
        dec, cfg = self._dec, self.cfg
        t = self.chunk
        live = [s for s in range(self.slots) if self._active[s] is not None]
        attend = min(
            cfg.max_len,
            -(-(max(self._host_pos[s] for s in live) + t) // 128) * 128,
        )
        st = self._state
        (st["cache"], st["logits"], st["pos"], st["done"], st["kv"],
         st["keys"], toks) = dec.decode_chunk(
            self.params, st["cache"], st["logits"], st["pos"], st["done"],
            st["kv"], st["keys"], cfg, t, self.temperature, attend,
        )
        rows = np.asarray(toks)  # the one per-chunk readback
        for s in live:
            req = self._active[s]
            emitted = rows[s]
            for tok in emitted:
                tok = int(tok)
                if tok == dec.EOS or tok == dec.PAD:
                    req.done = True
                    break
                req.tokens.append(tok)
                if len(req.tokens) >= req.max_new:
                    req.done = True
                    break
            self._host_pos[s] += t
            if req.done:
                self._active[s] = None
                req.event.set()

    def _retire_stale(self) -> None:
        """Force-freeze device slots whose request was retired without EOS
        (budget hit): their done flag must flip so they stop consuming
        positions. Cheap — one tiny donated dispatch."""
        jnp = self._jax.numpy
        st = self._state
        active_mask = np.array(
            [self._active[s] is not None for s in range(self.slots)]
        )
        st["done"] = st["done"] | jnp.asarray(~active_mask)

    def _loop(self) -> None:
        try:
            self._state = self._init_state()
        except Exception as exc:  # pragma: no cover - init failures surface
            logger.exception("continuous batcher init failed")
            with self._cond:
                for r in self._pending:
                    r.err = exc
                    r.event.set()
                self._pending.clear()
            return
        while True:
            with self._cond:
                while (
                    not self._stop and not self._pending
                    and all(r is None for r in self._active)
                    and not self._admissions
                ):
                    self._cond.wait()
                if self._stop:
                    for r in self._pending:
                        r.err = RuntimeError("batcher shut down")
                        r.event.set()
                    self._pending.clear()
                    for adm in self._admissions:
                        adm["req"].err = RuntimeError("batcher shut down")
                        adm["req"].event.set()
                    self._admissions.clear()
                    return
                pending, self._pending = self._pending, []
            try:
                for k, req in enumerate(pending):
                    slot = next(
                        (s for s in range(self.slots)
                         if self._active[s] is None
                         and s not in self._reserved), None,
                    )
                    if slot is None:
                        with self._cond:
                            # keep arrival order ahead of newer submissions
                            self._pending[:0] = pending[k:]
                        break
                    try:
                        if self.prefill_chunk > 0:
                            self._begin_admission(slot, req)
                        else:
                            self._admit(slot, req)
                    except Exception as exc:
                        logger.exception("admission failed")
                        self._reserved.discard(slot)
                        req.err = exc
                        req.event.set()
                if self._admissions:
                    self._step_admissions()
                if any(r is not None for r in self._active):
                    self._run_chunk()
                    self._retire_stale()
            except Exception as exc:
                # fail every in-flight request; the router's failover turns
                # this into the recall-only fallback upstream
                logger.exception("continuous batcher chunk failed")
                for s in range(self.slots):
                    if self._active[s] is not None:
                        self._active[s].err = exc
                        self._active[s].event.set()
                        self._active[s] = None
                for adm in self._admissions:
                    adm["req"].err = exc
                    adm["req"].event.set()
                self._admissions.clear()
                self._reserved.clear()
                # device state may hold donated/invalid buffers — rebuild
                try:
                    self._state = self._init_state()
                except Exception:
                    logger.exception("serving state rebuild failed")
