"""Continuous-batching inference server.

The north-star deployment shape (BASELINE.json: "greedy/beam decode loops
run device-side under continuous batching"): requests arrive one crop (or a
few) at a time; the server coalesces them into the fixed batch shape the
jitted graph was compiled for, pads partial batches, and fans results back
out. One compiled graph, no shape churn.

Host-side batching only — the device work is whatever `infer_fn` was built
from (e.g. MGPSTRInference.recognize).

Sizing note (measured): with N *synchronous* clients at most N requests are
ever in flight, so a batch_size far above the client concurrency mostly
pads (fill = N/batch). Pick batch_size ≈ expected concurrent requests, or
have clients submit futures asynchronously."""

from __future__ import annotations

import queue
import threading
from collections import deque
from concurrent.futures import Future
from typing import Callable, List, Optional, Sequence

import numpy as np


class ContinuousBatcher:
    def __init__(self, infer_fn: Callable[[np.ndarray], Sequence],
                 batch_size: int, item_shape,
                 max_wait_ms: float = 5.0, dtype=np.uint8):
        """infer_fn: [batch_size, *item_shape] → sequence of per-item
        results. Requests smaller than batch_size wait up to max_wait_ms
        for co-travelers, then go padded."""
        self.infer_fn = infer_fn
        self.batch_size = batch_size
        self.item_shape = tuple(item_shape)
        self.max_wait = max_wait_ms / 1000.0
        self.dtype = dtype
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._started = False
        self.stats = {"batches": 0, "items": 0, "padded_slots": 0}

    def start(self) -> "ContinuousBatcher":
        if not self._started:
            self._worker.start()
            self._started = True
        return self

    def stop(self) -> None:
        self._stop.set()
        self._q.put(None)  # wake the worker
        if self._started:
            self._worker.join(timeout=5)

    def submit(self, item: np.ndarray) -> Future:
        """item: [*item_shape] → Future of the per-item result."""
        if item.shape != self.item_shape:
            raise ValueError(f"item shape {item.shape} != {self.item_shape}")
        fut: Future = Future()
        self._q.put((np.asarray(item, self.dtype), fut))
        return fut

    def __call__(self, items: Sequence[np.ndarray]) -> List:
        """Blocking convenience: submit many, wait for all."""
        futs = [self.submit(it) for it in items]
        return [f.result() for f in futs]

    def _collect(self) -> List:
        """Block for the first item, then soak up to batch_size within
        max_wait."""
        first = self._q.get()
        if first is None or self._stop.is_set():
            return []
        batch = [first]
        import time

        deadline = time.perf_counter() + self.max_wait
        while len(batch) < self.batch_size:
            timeout = deadline - time.perf_counter()
            if timeout <= 0:
                break
            try:
                nxt = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is None:
                break
            batch.append(nxt)
        return batch

    def _loop(self) -> None:
        while not self._stop.is_set():
            pairs = self._collect()
            if not pairs:
                continue
            buf = np.zeros((self.batch_size, *self.item_shape), self.dtype)
            for i, (item, _) in enumerate(pairs):
                buf[i] = item
            try:
                results = self.infer_fn(buf)
            except Exception as e:  # fan the error out to all waiters
                for _, fut in pairs:
                    fut.set_exception(e)
                continue
            for i, (_, fut) in enumerate(pairs):
                fut.set_result(results[i])
            self.stats["batches"] += 1
            self.stats["items"] += len(pairs)
            self.stats["padded_slots"] += self.batch_size - len(pairs)


class SpottingDecodeServer:
    """Cross-request continuous batching for an OmniParser seq decoder.

    A fixed pool of decode slots lives on device. Every tick runs ONE jitted
    ragged decode step for all slots simultaneously — each slot at its own
    absolute position (SeqDecoder.step_ragged) over its own encoder memory.
    New requests prefill (batch-1 jit) straight into free slots and finished
    slots free up immediately, so there is no batch-formation barrier
    (vLLM-style scheduling expressed as static-shape XLA ops; the reference
    serves each request independently — SURVEY.md §5 serving gap).

    Requests are `(memory [S,C], mem_pos [S,C], mem_valid [S],
    prompt_ids [P])` with S/P fixed at server construction (one compiled
    graph). `submit` returns a Future resolving to the decoded token list
    (EOS excluded).
    """

    def __init__(self, model, params, task: str = "rec", n_slots: int = 8,
                 max_steps: int = 32, eos_id: Optional[int] = 1,
                 pad_id: int = 0, logit_mask=None, mask_fn=None,
                 poll_ms: float = 2.0, mem_len: Optional[int] = None,
                 max_prompt_len: Optional[int] = None,
                 burst_ticks: int = 1, wave_size: Optional[int] = None):
        """burst_ticks: decode steps per device dispatch (`lax.scan`
        inside one jit). Each dispatch costs one host→device→host round
        trip — a few µs on a local host, tens of ms through a network
        tunnel — so bursts amortize that fixed cost over T tokens. The
        price: finished lanes idle until the burst ends and free slots
        refill only between bursts, so keep T well under the typical
        sequence length (waste ≤ (T−1)/seq_len of slot ticks)."""
        import jax
        import jax.numpy as jnp

        self.model = model
        self.params = params
        self.task = task
        self.n_slots = n_slots
        self.max_steps = max_steps
        self.burst = max(1, int(burst_ticks))
        self.eos_id = eos_id
        self.pad_id = pad_id
        self.poll = poll_ms / 1000.0
        # Shape budget for mixed-size requests. Memories shorter than
        # mem_len are zero-padded at submit time (mem_valid=0 → -1e9
        # attention bias, so padding never contributes); prompts shorter
        # than max_prompt_len reuse the one tick graph because the KV cache
        # length is fixed at max_prompt_len + max_steps + 1 (only the tiny
        # B=1 prefill compiles once per distinct prompt length). None =
        # latch from the first request (single-shape serving).
        self.mem_len = mem_len
        self.max_prompt_len = max_prompt_len
        self._logit_mask = logit_mask  # [num_classes] additive, e.g. -1e9
        # step-dependent masking (e.g. OmniParser pt's coordinate/eos
        # alternation, transformer.py:110-116): mask_fn(pos_vec [B],
        # logits [B, V]) -> logits, traced into the tick graph
        self._mask_fn = mask_fn
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._started = False
        self._state = None
        self._slots: List[Optional[dict]] = [None] * n_slots
        self._pending: "deque" = deque()     # in-flight tick results
        self._backlog: "deque" = deque()     # validated+padded requests
        # refill-wave batch (co-queued requests prefilled per dispatch);
        # fixed so exactly one prefill graph compiles per prompt length
        self.wave_size = min(n_slots, wave_size or min(n_slots, 16))
        self.stats = {"ticks": 0, "requests": 0, "occupied_slot_ticks": 0}

        def _prefill(p, memory, mem_pos, mem_valid, prompt_ids, cache_len):
            def run(m):
                dec = getattr(m, f"{task}_decoder")
                mem_kvs = dec.mem_kvs(memory, mem_pos)
                mem_bias = jnp.where(mem_valid[:, None, None, :] > 0, 0.0, -1e9)
                emb, qpos = m.embedding(prompt_ids, task)
                logits, caches = dec.prefill(emb, qpos, mem_kvs, mem_bias,
                                             cache_len)
                return logits[:, -1], caches, mem_kvs, mem_bias
            return self.model.apply({"params": p}, method=run)

        self._prefill = jax.jit(_prefill, static_argnums=(5,))

        def _insert(state, slot_idx, last_logits, caches, mem_kvs, mem_bias,
                    pos0):
            """Scatter a WAVE of k prefilled requests into slots slot_idx
            [k] with one dispatch (duplicate indices carry identical rows
            — the power-of-2 bucketing pads a wave by repeating its last
            request/slot, so scatter order never matters)."""
            def put(dst, new):
                return dst.at[slot_idx].set(new.astype(dst.dtype))
            new_state = dict(state)
            new_state["caches"] = jax.tree.map(put, state["caches"], caches)
            new_state["mem_kvs"] = jax.tree.map(put, state["mem_kvs"], mem_kvs)
            new_state["mem_bias"] = put(state["mem_bias"], mem_bias)
            new_state["last_logits"] = put(state["last_logits"], last_logits)
            new_state["pos"] = state["pos"].at[slot_idx].set(pos0)
            new_state["finished"] = state["finished"].at[slot_idx].set(False)
            return new_state

        self._insert = jax.jit(_insert, donate_argnums=(0,))

        def _tick(p, state):
            def run(m):
                dec = getattr(m, f"{task}_decoder")

                def body(st, _):
                    logits = st["last_logits"]
                    if self._logit_mask is not None:
                        logits = logits + jnp.asarray(self._logit_mask,
                                                      logits.dtype)[None]
                    if self._mask_fn is not None:
                        logits = self._mask_fn(st["pos"], logits)
                    tok = jnp.argmax(logits, -1).astype(jnp.int32)
                    was_finished = st["finished"]
                    finished = (was_finished if eos_id is None
                                else was_finished | (tok == eos_id))
                    out_tok = jnp.where(was_finished, pad_id, tok)
                    emb, qpos = m.embedding.embed_at(out_tok[:, None], task,
                                                     st["pos"])
                    new_logits, caches = dec.step_ragged(
                        emb, qpos, st["caches"], st["pos"],
                        st["mem_kvs"], st["mem_bias"])
                    cache_len = jax.tree.leaves(st["caches"])[0].shape[1]
                    new_st = dict(st)
                    new_st["caches"] = caches
                    new_st["last_logits"] = new_logits[:, 0]
                    new_st["pos"] = jnp.minimum(st["pos"] + 1, cache_len - 1)
                    new_st["finished"] = finished
                    return new_st, (out_tok, was_finished)

                # burst_ticks decode steps per dispatch: one host round
                # trip buys `burst` tokens per live slot ([T, n_slots]
                # outputs; T=1 == the classic single tick)
                new_state, (out_tok, was_finished) = jax.lax.scan(
                    body, state, None, length=self.burst)
                return new_state, out_tok, was_finished
            return self.model.apply({"params": p}, method=run)

        self._tick = jax.jit(_tick, donate_argnums=(1,))

    # ---- lifecycle ----

    def start(self) -> "SpottingDecodeServer":
        if not self._started:
            self._worker.start()
            self._started = True
        return self

    def stop(self) -> None:
        self._stop.set()
        self._q.put(None)
        if self._started:
            self._worker.join(timeout=10)

    def submit(self, memory, mem_pos, mem_valid, prompt_ids) -> Future:
        """memory/mem_pos/mem_valid may be device (jax) arrays — they are
        consumed on device without a host round trip, so N requests can
        share one encoder-memory buffer for free. Prompts are host-side
        (they are stacked per refill wave)."""
        def keep(a):                        # device arrays stay on device
            return a if hasattr(a, "sharding") else np.asarray(a)

        fut: Future = Future()
        self._q.put((keep(memory), keep(mem_pos), keep(mem_valid),
                     np.asarray(prompt_ids), fut))
        return fut

    # ---- worker ----

    def _init_state(self, caches, mem_kvs, mem_bias, last_logits):
        import jax
        import jax.numpy as jnp

        def blank(a):
            return jnp.zeros((self.n_slots,) + a.shape[1:], a.dtype)

        return {
            "caches": jax.tree.map(blank, caches),
            "mem_kvs": jax.tree.map(blank, mem_kvs),
            "mem_bias": blank(mem_bias),
            "last_logits": blank(last_logits),
            "pos": jnp.zeros((self.n_slots,), jnp.int32),
            "finished": jnp.ones((self.n_slots,), bool),
        }

    def _prepare(self, req):
        """Validate + pad one request to the (mem_len, ≤max_prompt_len)
        bucket; latches budgets from the first request. Returns the
        padded tuple, or None after set_exception on a budget breach."""
        import numpy as _np

        memory, mem_pos, mem_valid, prompt_ids, fut = req
        P = prompt_ids.shape[0]
        S = memory.shape[0]
        if self.mem_len is None:
            self.mem_len = S
        if self.max_prompt_len is None:
            self.max_prompt_len = P
        if S > self.mem_len or P > self.max_prompt_len:
            fut.set_exception(ValueError(
                f"request (prompt_len={P}, mem_len={S}) exceeds the "
                f"server budget (max_prompt_len="
                f"{self.max_prompt_len}, mem_len={self.mem_len}) — "
                f"construct the server with larger budgets"))
            return None
        if S < self.mem_len:
            # pad to the bucket: zero memory rows with mem_valid=0
            # become -1e9 attention bias, contributing nothing (device
            # arrays pad on device — async dispatch, no sync)
            import jax.numpy as jnp

            padm = self.mem_len - S

            def _pad0(a):
                xp = jnp if hasattr(a, "sharding") else _np
                return xp.pad(a, [(0, padm)] + [(0, 0)] * (a.ndim - 1))

            memory, mem_pos, mem_valid = (
                _pad0(memory), _pad0(mem_pos), _pad0(mem_valid))
        return memory, mem_pos, mem_valid, prompt_ids, fut

    def _insert_wave(self, wave, slots) -> None:
        """ONE batched prefill + ONE scatter insert for k co-queued
        requests (equal prompt lengths). Per-request B=1 prefills cost a
        dispatch round trip each — with per-instance poly/rec fan-out a
        65-instance page paid ~260 round trips in refills alone, which
        through a remote tunnel dwarfed the decode itself. The wave is
        ALWAYS padded to `wave_size` rows (repeating its last row/slot —
        identical duplicate scatter rows are order-safe), so exactly ONE
        prefill/insert graph exists per prompt length: wave sizes depend
        on arrival timing, and timing-dependent compile variants showed
        up as multi-second stalls scattered through measured traffic."""
        import jax.numpy as jnp
        import numpy as _np

        k = len(wave)
        kp = self.wave_size
        rows = list(wave) + [wave[-1]] * (kp - k)
        slot_idx = _np.asarray(list(slots) + [slots[-1]] * (kp - k),
                               _np.int32)
        # device rows stack on device (per-instance requests all reference
        # ONE encoder-memory buffer — nothing crosses the host link); np
        # rows stack host-side and upload once as the batch
        xp = jnp if hasattr(rows[0][0], "sharding") else _np
        memory = xp.stack([r[0] for r in rows])
        mem_pos = xp.stack([r[1] for r in rows])
        mem_valid = xp.stack([r[2] for r in rows])
        prompts = _np.stack([r[3] for r in rows])
        P = prompts.shape[1]
        cache_len = self.max_prompt_len + self.max_steps + 1
        last_logits, caches, mem_kvs, mem_bias = self._prefill(
            self.params, memory, mem_pos, mem_valid, prompts, cache_len)
        if self._state is None:
            self._state = self._init_state(caches, mem_kvs, mem_bias,
                                           last_logits)
        self._state = self._insert(
            self._state, slot_idx, last_logits, caches, mem_kvs, mem_bias,
            _np.full((kp,), P, _np.int32))
        for (_, _, _, _, fut), s in zip(wave, slots):
            self._slots[s] = {"future": fut, "tokens": [], "steps": 0}
            self.stats["requests"] += 1

    def _fill_slots(self) -> bool:
        """Move queued requests into free slots in batched waves.
        Returns False when the stop sentinel was consumed."""
        block = (not any(self._slots) and not self._pending
                 and not self._backlog)
        # drain the queue into the validated backlog (bounded lookahead
        # so a flood of requests can't starve the tick loop)
        while len(self._backlog) < 2 * self.n_slots:
            try:
                req = self._q.get(block=block, timeout=self.poll)
            except queue.Empty:
                break
            block = False
            if req is None:
                return False
            prepared = self._prepare(req)
            if prepared is not None:
                self._backlog.append(prepared)
        # FIFO waves: the longest prefix of the backlog with one prompt
        # length, up to the free-slot count, inserted in one dispatch pair
        while None in self._slots and self._backlog:
            free = [i for i, s in enumerate(self._slots) if s is None]
            P = self._backlog[0][3].shape[0]
            wave = []
            cap = min(len(free), self.wave_size)
            while (self._backlog and len(wave) < cap
                   and self._backlog[0][3].shape[0] == P):
                wave.append(self._backlog.popleft())
            self._insert_wave(wave, free[:len(wave)])
        return True

    def _process(self, out_tok, was_finished, snapshot) -> None:
        """Host-side result handling for ONE dispatch — `burst` tick rows
        [T, n_slots] (possibly one or two dispatches behind the device —
        see _loop). np.asarray is the sync."""
        import numpy as _np

        toks = _np.asarray(out_tok)
        fin = _np.asarray(was_finished)
        for t in range(toks.shape[0]):
            self.stats["ticks"] += 1
            for i, slot in enumerate(snapshot):
                if slot is None:
                    continue
                if slot["future"].done():
                    # completed (by max_steps, or by EOS on an earlier
                    # burst row) while this lane kept ticking: discard
                    if self._slots[i] is slot:
                        self._slots[i] = None
                    continue
                self.stats["occupied_slot_ticks"] += 1
                done = False
                if fin[t, i]:
                    done = True      # EOS was consumed on a prior tick
                else:
                    tok = int(toks[t, i])
                    if self.eos_id is not None and tok == self.eos_id:
                        done = True
                    else:
                        slot["tokens"].append(tok)
                        slot["steps"] += 1
                        done = slot["steps"] >= self.max_steps
                if done:
                    slot["future"].set_result(slot["tokens"])
                    if self._slots[i] is slot:  # free (never reused before
                        self._slots[i] = None   # its dispatch was processed)

    def _loop(self) -> None:
        """Tick pipeline, depth 2: the host fetch of tick t's tokens
        (one tunnel RTT on a remote TPU) overlaps with tick t+1 already
        running on device. A slot finishing at tick t is therefore
        reused one tick later than a fully-synchronous loop would — the
        occupancy cost of hiding the RTT. Ticks on device-finished slots
        emit pad tokens into `finished`-masked lanes, so late processing
        never corrupts results (tested vs the synchronous oracle)."""
        while not self._stop.is_set():
            try:
                if not self._fill_slots():
                    return
                if any(self._slots):
                    self._state, out_tok, was_finished = self._tick(
                        self.params, self._state)
                    self._pending.append((out_tok, was_finished,
                                          list(self._slots)))
                # drain: keep at most one dispatch in flight while slots
                # are live; drain fully when the pool is idle
                keep = 1 if any(self._slots) else 0
                while len(self._pending) > keep:
                    self._process(*self._pending.popleft())
            except Exception as e:
                # fan the failure to every waiter instead of silently
                # killing the worker (which leaves clients hanging until
                # their timeout) and reset to an empty pool — the state
                # may be half-donated mid-dispatch
                for s in self._slots:
                    if s is not None and not s["future"].done():
                        s["future"].set_exception(e)
                for r in self._backlog:
                    if not r[4].done():
                        r[4].set_exception(e)
                self._slots = [None] * self.n_slots
                self._backlog.clear()
                self._pending.clear()
                self._state = None


class SpottingService:
    """Full OmniParser text-spotting as a continuously-batched service.

    Wires the three decode stages the reference runs as sequential
    per-request loops (transformer.py:235-289) through slot-based
    cross-request servers: a jitted B=1 encoder, a `pt` server with the
    coordinate/eos parity mask, then per-INSTANCE polygon and recognition
    requests fanned into `poly`/`rec` servers. Unlike the static
    `infer_spotting` graph (which pads to max_instances), the service
    decodes exactly the detected instances — and instances from different
    page requests share device ticks.

    `submit(image)` → Future of {"points": [N,2] bin tokens,
    "polygons": [N, poly_length] bins, "rec_tokens": [N, list]}.
    """

    def __init__(self, model, params, n_slots: int = 8,
                 poll_ms: float = 1.0, mem_len: Optional[int] = None,
                 encode_batch: int = 4, encode_wait_ms: float = 3.0,
                 burst_ticks: int = 8):
        """mem_len: encoder-memory budget for mixed page sizes — smaller
        pages are padded into the bucket (SpottingDecodeServer mem_len);
        None serves only the first-seen page shape.

        encode_batch: concurrent page submissions share ONE batched
        encoder forward (VERDICT r4 item 2 — the Swin encode dominates
        page cost, and B=1 encodes from N threads serialize on the
        device anyway; batching them amortizes both the forward and the
        dispatch). Pages queue up to encode_wait_ms for co-travelers.
        Set encode_batch=1 to restore per-page encodes.

        burst_ticks: decode steps per device dispatch on each stage
        server (see SpottingDecodeServer.burst_ticks) — 8 keeps burst
        waste under ~6% for the shortest stage (poly_length 16) while
        amortizing the dispatch round trip 8×."""
        import jax
        import jax.numpy as jnp

        self.model = model
        self.params = params
        c = model.config
        v = c.vocab()
        self.cfg = c
        self.vocab = v
        NEG = -1e9

        def _encode(p, images):
            return model.apply({"params": p}, images,
                               method=lambda m, im: m.encode(im))

        self._encode = jax.jit(_encode)
        self._encode_batch = max(1, int(encode_batch))
        self._encode_wait_ms = encode_wait_ms
        self._encode_batcher: Optional[ContinuousBatcher] = None
        self._encode_lock = threading.Lock()

        pt_prompt = list(v.pt_prompt(c.use_char_window_prompt))
        self._pt_prompt = pt_prompt
        P_pt = len(pt_prompt)

        def pt_mask(pos, logits):
            # step parity relative to the prompt end (model.infer_spotting
            # pt_mask): even steps may emit coords or EOS, odd steps coords
            step = pos - P_pt
            ids = jnp.arange(logits.shape[-1])
            coord = ids < c.num_bins
            eos = ids == v.pt_eos_index
            allow = jnp.where((step % 2 == 0)[:, None], (coord | eos)[None],
                              coord[None])
            return jnp.where(allow, logits, NEG)

        ids = np.arange(v.num_classes)
        poly_mask = np.where(ids < c.num_bins, 0.0, NEG).astype(np.float32)
        rec_allow = ((ids >= c.num_bins) & (ids <= v.rec_eos_index)
                     & (ids != v.pt_eos_index) & (ids != v.poly_eos_index))
        rec_mask = np.where(rec_allow, 0.0, NEG).astype(np.float32)

        self.pt_server = SpottingDecodeServer(
            model, params, "pt", n_slots=n_slots, max_steps=c.pt_seq_length,
            eos_id=v.pt_eos_index, pad_id=v.padding_index, mask_fn=pt_mask,
            poll_ms=poll_ms, mem_len=mem_len, burst_ticks=burst_ticks)
        self.poly_server = SpottingDecodeServer(
            model, params, "poly", n_slots=n_slots * 4,
            max_steps=c.poly_length, eos_id=None, pad_id=v.padding_index,
            logit_mask=poly_mask, poll_ms=poll_ms, mem_len=mem_len,
            burst_ticks=burst_ticks)
        self.rec_server = SpottingDecodeServer(
            model, params, "rec", n_slots=n_slots * 4,
            max_steps=c.rec_length, eos_id=v.rec_eos_index,
            pad_id=v.padding_index, logit_mask=rec_mask, poll_ms=poll_ms,
            mem_len=mem_len, burst_ticks=burst_ticks)
        self._started = False

    def start(self) -> "SpottingService":
        if not self._started:
            self.pt_server.start()
            self.poly_server.start()
            self.rec_server.start()
            self._started = True
        return self

    def stop(self) -> None:
        if self._encode_batcher is not None:
            self._encode_batcher.stop()
        self.pt_server.stop()
        self.poly_server.stop()
        self.rec_server.stop()

    def _encode_page(self, image: np.ndarray) -> Future:
        """Future of (memory, mem_pos, mem_valid) for one page — through
        the shared batched encoder when encode_batch > 1."""
        image = np.asarray(image, np.float32)
        if self._encode_batch == 1:
            memory, mem_pos, mem_valid = self._encode(self.params,
                                                      image[None])
            fut: Future = Future()
            # DEVICE slices: the page memory never leaves the chip — the
            # decode servers prefill from it directly, and every
            # per-instance poly/rec request references the same buffer
            # (the old np.asarray here paid a D2H, then one H2D per
            # instance re-uploading identical megabytes)
            fut.set_result((memory[0], mem_pos[0], mem_valid[0]))
            return fut
        with self._encode_lock:
            if self._encode_batcher is None:
                def run(batch):
                    memory, mem_pos, mem_valid = self._encode(self.params,
                                                              batch)
                    return [(memory[i], mem_pos[i], mem_valid[i])
                            for i in range(batch.shape[0])]

                self._encode_batcher = ContinuousBatcher(
                    run, self._encode_batch, image.shape,
                    max_wait_ms=self._encode_wait_ms,
                    dtype=np.float32).start()
        return self._encode_batcher.submit(image)

    def submit(self, image: np.ndarray) -> Future:
        """image [H, W, 3] (normalized float) → Future of the spotting
        result dict. The encode rides the shared batched encoder and the
        pt→poly/rec fan-out runs in callbacks, so many pages can be in
        flight at once."""
        result: Future = Future()
        enc_fut = self._encode_page(image)

        def on_encoded(fut: Future) -> None:
            try:
                memory, mem_pos, mem_valid = fut.result()
            except Exception as e:              # pragma: no cover
                result.set_exception(e)
                return
            pt_fut = self.pt_server.submit(
                memory, mem_pos, mem_valid,
                np.asarray(self._pt_prompt, np.int32))
            pt_fut.add_done_callback(
                lambda f: self._on_pt(f, memory, mem_pos, mem_valid, result))

        enc_fut.add_done_callback(on_encoded)
        return result

    def _on_pt(self, fut: Future, memory, mem_pos, mem_valid,
               result: Future) -> None:
        """pt decode finished → fan each detected instance into the
        poly/rec servers; resolve `result` when all children land."""
        v = self.vocab
        try:
            toks = [t for t in fut.result() if t != v.pt_eos_index]
            pts = [(toks[i], toks[i + 1])
                   for i in range(0, len(toks) - 1, 2)]
            pts = pts[: self.cfg.max_instances]
            if not pts:
                result.set_result({"points": np.zeros((0, 2), np.int32),
                                   "polygons": [], "rec_tokens": []})
                return
            poly_futs, rec_futs = [], []
            for (x, y) in pts:
                poly_prompt = np.asarray([x, y, v.poly_sos_index], np.int32)
                rec_prompt = np.asarray([x, y, v.rec_sos_index], np.int32)
                poly_futs.append(self.poly_server.submit(
                    memory, mem_pos, mem_valid, poly_prompt))
                rec_futs.append(self.rec_server.submit(
                    memory, mem_pos, mem_valid, rec_prompt))

            remaining = {"n": 2 * len(pts)}
            lock = threading.Lock()

            def on_child(_):
                with lock:
                    remaining["n"] -= 1
                    if remaining["n"]:
                        return
                try:
                    result.set_result({
                        "points": np.asarray(pts, np.int32),
                        "polygons": [f.result() for f in poly_futs],
                        "rec_tokens": [f.result() for f in rec_futs],
                    })
                except Exception as e:          # pragma: no cover
                    result.set_exception(e)

            for f in poly_futs + rec_futs:
                f.add_done_callback(on_child)
        except Exception as e:                  # pragma: no cover
            result.set_exception(e)

    def __call__(self, images: Sequence[np.ndarray],
                 timeout: float = 600.0) -> List[dict]:
        futs = [self.submit(im) for im in images]
        return [f.result(timeout=timeout) for f in futs]

    @property
    def occupancy(self) -> dict:
        """Slot occupancy per stage: occupied_slot_ticks / (ticks*slots)."""
        out = {}
        for name, srv in (("pt", self.pt_server), ("poly", self.poly_server),
                          ("rec", self.rec_server)):
            t = srv.stats["ticks"] * srv.n_slots
            out[name] = srv.stats["occupied_slot_ticks"] / t if t else 0.0
        return out
