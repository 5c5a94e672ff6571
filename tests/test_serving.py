"""Continuous-batching decoder serving (chat/serving.py + the decoder's
per-slot decode ops).

Pins down the contracts the scheduler is built on:
- greedy streams are identical to decoder.generate()'s for the same prompt,
- ISOLATION: a request's tokens never depend on batch composition (slots
  are row-local),
- EOS/budget free slots and queued requests get admitted (more requests
  than slots all complete),
- temperature>0 stays reproducible per request under batching,
- the LocalDecoderChatClient continuous scheduler answers match the
  coalescing scheduler's (same math, different scheduling).
"""

import numpy as np
import pytest

import jax

from omni_recall_tpu.chat.serving import ContinuousBatcher
from omni_recall_tpu.models import decoder


CFG = decoder.DecoderConfig(
    d_model=32, n_layers=2, n_heads=2, d_ff=64, max_len=160
)
PARAMS = decoder.init_params(jax.random.PRNGKey(7), CFG)
BUCKETS = (32, 64)


def _mk_batcher(temperature=0.0, slots=2, chunk=4, params=PARAMS):
    return ContinuousBatcher(
        decoder, jax, params, CFG, slots=slots, chunk=chunk,
        temperature=temperature, prompt_buckets=BUCKETS,
    )


def _reference_generate(toks, n_steps, bucket=None, temperature=0.0, seed=0):
    bucket = bucket or next(b for b in BUCKETS if b >= len(toks))
    prompt = decoder.pad_left_batch([toks], bucket)
    out = decoder.generate(
        PARAMS, prompt, CFG, n_steps, jax.random.PRNGKey(seed),
        temperature=temperature,
    )
    row = [int(t) for t in np.asarray(out)[0]]
    clean = []
    for t in row:
        if t in (decoder.EOS, decoder.PAD):
            break
        clean.append(t)
    return clean


def test_greedy_stream_matches_generate():
    toks = decoder.encode_text("hello recall world")
    batcher = _mk_batcher()
    got = batcher.generate_sync(toks, seed=0, max_new=12)
    ref = _reference_generate(toks, 12)
    assert got == ref
    batcher.shutdown()


def test_isolation_under_concurrent_requests():
    """Tokens for prompt A are identical whether A runs alone or next to
    other requests in the slot batch."""
    import threading

    toks_a = decoder.encode_text("alpha prompt")
    toks_b = decoder.encode_text("a very different beta prompt text")
    alone = _mk_batcher().generate_sync(toks_a, seed=0, max_new=10)

    batcher = _mk_batcher()
    results = {}

    def run(name, toks):
        results[name] = batcher.generate_sync(toks, seed=0, max_new=10)

    threads = [
        threading.Thread(target=run, args=("a", toks_a)),
        threading.Thread(target=run, args=("b", toks_b)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results["a"] == alone
    assert results["b"]  # b produced something of its own
    batcher.shutdown()


def test_more_requests_than_slots_all_complete():
    import threading

    batcher = _mk_batcher(slots=2, chunk=4)
    prompts = [decoder.encode_text(f"prompt number {i}") for i in range(5)]
    results = [None] * 5

    def run(i):
        results[i] = batcher.generate_sync(prompts[i], seed=i, max_new=6)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, toks in enumerate(prompts):
        assert results[i] == _reference_generate(toks, 6), f"request {i}"
    batcher.shutdown()


def test_eos_frees_slot_early():
    """A checkpoint that always emits EOS finishes instantly; the freed
    slot admits the queued request (1 slot, 2 requests)."""
    import jax.numpy as jnp

    # an all-zero LM head ties every (emittable) logit; greedy argmax picks
    # the lowest id, which is EOS — guaranteed instant termination
    eos_params = jax.tree.map(lambda p: p, PARAMS)
    eos_params["lm_head"] = jnp.zeros(PARAMS["lm_head"].shape, jnp.float32)
    batcher = _mk_batcher(slots=1, chunk=4, params=eos_params)
    out1 = batcher.generate_sync(decoder.encode_text("one"), 0, max_new=32)
    out2 = batcher.generate_sync(decoder.encode_text("two"), 0, max_new=32)
    assert out1 == [] and out2 == []
    batcher.shutdown()


def test_sampling_reproducible_per_request():
    import threading

    toks = decoder.encode_text("sample me")
    alone = _mk_batcher(temperature=0.8).generate_sync(toks, seed=123, max_new=8)
    assert alone  # sampled bytes
    batcher = _mk_batcher(temperature=0.8)
    results = {}

    def run(name, t, seed):
        results[name] = batcher.generate_sync(t, seed=seed, max_new=8)

    threads = [
        threading.Thread(target=run, args=("a", toks, 123)),
        threading.Thread(
            target=run, args=("b", decoder.encode_text("other"), 9)
        ),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results["a"] == alone
    batcher.shutdown()


def test_budget_retires_and_slot_is_reusable():
    batcher = _mk_batcher(slots=1, chunk=4)
    toks = decoder.encode_text("budget test")
    out = batcher.generate_sync(toks, seed=0, max_new=5)
    assert len(out) <= 5
    out2 = batcher.generate_sync(toks, seed=0, max_new=5)
    assert out2 == out  # the reused slot reproduces the stream
    batcher.shutdown()


CFG32 = decoder.DecoderConfig(
    d_model=32, n_layers=2, n_heads=2, d_ff=64, max_len=160,
    compute_dtype="float32",
)
PARAMS32 = decoder.init_params(jax.random.PRNGKey(3), CFG32)


def test_prefill_block_chain_matches_prefill_f32():
    """In f32 the cache holds full-precision k/v, so chaining prefill_block
    reproduces prefill() exactly (masked softmax terms are exact zeros and
    XLA's padded tree-reductions make zero tails additive no-ops)."""
    import jax.numpy as jnp

    toks_a = decoder.encode_text("chunked prefill parity check text here")
    toks_b = decoder.encode_text("short")
    prompt = decoder.pad_left_batch([toks_a, toks_b], 64)
    full_logits, full_cache = decoder.prefill(PARAMS32, jnp.asarray(prompt), CFG32)
    chk_logits, chk_cache = decoder.prefill_chunked(PARAMS32, prompt, CFG32, chunk=16)
    np.testing.assert_allclose(
        np.asarray(chk_logits), np.asarray(full_logits), rtol=1e-5, atol=1e-5
    )
    # compare cached k/v only at real (non-PAD) positions: left-PAD cells
    # hold garbage from fully-masked attention rows (whose uniform-softmax
    # output depends on the attention window) and are never attendable
    for row, toks in enumerate((toks_a, toks_b)):
        first = 64 - len(toks)
        for li in range(CFG32.n_layers):
            for kv in ("k", "v"):
                np.testing.assert_allclose(
                    np.asarray(chk_cache[li][kv])[row, first:64],
                    np.asarray(full_cache[li][kv])[row, first:64],
                    rtol=1e-5, atol=1e-6,
                )


def test_prefill_block_bf16_decode_grade():
    """bf16 chunked prefill matches whole-prompt prefill to cache-dtype
    rounding (cross-block keys are read from the bf16 cache, exactly like
    decode_step reads generated tokens' keys)."""
    import jax.numpy as jnp

    toks = decoder.encode_text("bfloat16 chunked prefill tolerance probe")
    prompt = decoder.pad_left_batch([toks], 64)
    full_logits, _ = decoder.prefill(PARAMS, jnp.asarray(prompt), CFG)
    chk_logits, _ = decoder.prefill_chunked(PARAMS, prompt, CFG, chunk=16)
    scale = float(np.max(np.abs(np.asarray(full_logits)))) or 1.0
    assert np.max(np.abs(np.asarray(chk_logits) - np.asarray(full_logits))) <= 0.05 * scale


def test_chunked_prefill_serving_matches_whole_prefill_f32():
    """With an f32 cache the chunked-prefill scheduler's greedy streams are
    bit-identical to the whole-prefill scheduler's (and to generate())."""
    whole = ContinuousBatcher(
        decoder, jax, PARAMS32, CFG32, slots=2, chunk=4,
        prompt_buckets=BUCKETS,
    )
    chunked = ContinuousBatcher(
        decoder, jax, PARAMS32, CFG32, slots=2, chunk=4,
        prompt_buckets=BUCKETS, prefill_chunk=16,
    )
    for text, seed in (("hello recall world", 0), ("beta prompt", 5)):
        toks = decoder.encode_text(text)
        assert chunked.generate_sync(toks, seed, 12) == \
            whole.generate_sync(toks, seed, 12), text
    whole.shutdown()
    chunked.shutdown()


def test_chunked_prefill_isolation_and_completion():
    """bf16 default config: concurrent requests all complete under chunked
    admission, a request's stream is deterministic (two runs bit-equal),
    and admissions interleave with live decodes without corrupting them."""
    import threading

    batcher = ContinuousBatcher(
        decoder, jax, PARAMS, CFG, slots=2, chunk=4,
        prompt_buckets=BUCKETS, prefill_chunk=8,
    )
    prompts = [decoder.encode_text(f"prompt number {i} padded out") for i in range(5)]
    results = [None] * 5

    def run(i):
        results[i] = batcher.generate_sync(prompts[i], seed=i, max_new=6)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # deterministic: re-run each alone on the same batcher
    for i in range(5):
        assert results[i] == batcher.generate_sync(prompts[i], seed=i, max_new=6), i
    batcher.shutdown()


def test_prefill_budget_round_robin_completes_and_matches():
    """With a 1-block/iteration budget, many simultaneous long-prompt
    admissions still all complete, streams match the unbudgeted scheduler
    (f32 cache => bit-equal), and in-flight decodes keep advancing."""
    import threading

    kw = dict(slots=4, chunk=4, prompt_buckets=BUCKETS, prefill_chunk=8)
    budgeted = ContinuousBatcher(
        decoder, jax, PARAMS32, CFG32, prefill_budget=1, **kw
    )
    plain = ContinuousBatcher(decoder, jax, PARAMS32, CFG32, **kw)
    prompts = [
        decoder.encode_text(f"budgeted admission prompt {i} with filler words")
        for i in range(4)
    ]
    res_b, res_p = [None] * 4, [None] * 4

    def run(store, batcher, i):
        store[i] = batcher.generate_sync(prompts[i], seed=i, max_new=6)

    threads = [
        threading.Thread(target=run, args=(store, batcher, i))
        for store, batcher in ((res_b, budgeted), (res_p, plain))
        for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert res_b == res_p
    budgeted.shutdown()
    plain.shutdown()


def test_client_continuous_matches_coalesce():
    from omni_recall_tpu.contracts import AiChatRequest
    from omni_recall_tpu.chat.local import LocalDecoderChatClient

    kw = dict(max_new_tokens=10, cfg=CFG, params=PARAMS)
    cont = LocalDecoderChatClient(scheduler="continuous", chunk_tokens=4, **kw)
    coal = LocalDecoderChatClient(scheduler="coalesce", **kw)
    req = AiChatRequest(prompt="compare schedulers")
    try:
        a = cont.complete(req).text
        b = coal.complete(req).text
    except RuntimeError as exc:
        pytest.skip(f"untrained checkpoint produced empty text: {exc}")
    assert a == b
