"""Continuous batching (generate/continuous.py): vLLM-role slot scheduler.

Equivalence gate: greedy tokens from the slot scheduler must match the
batch engine's greedy generation per request, across staggered admissions,
mixed prompt lengths, DNA splicing, and slot reuse after completion.
"""

import numpy as np
import pytest

import jax

from bioreason_tpu.config import FusionConfig, SamplingConfig
from bioreason_tpu.data import BioProcessor, ByteTextTokenizer, KmerTokenizer
from bioreason_tpu.generate import GenerationEngine
from bioreason_tpu.generate.continuous import ContinuousBatcher, Request
from bioreason_tpu.models import init_fusion

TOK = ByteTextTokenizer()
PROC = BioProcessor(TOK, KmerTokenizer())


@pytest.fixture(scope="module")
def setup():
    cfg = FusionConfig.tiny(text_vocab=TOK.vocab_size,
                            dna_pad_token_id=TOK.dna_pad_id)
    params = init_fusion(jax.random.PRNGKey(0), cfg)
    engine = GenerationEngine(cfg, eos_token_id=TOK.eos_token_id)
    return cfg, params, engine


def _make_request(rid, text, dna=None, max_new=6):
    if dna is not None:
        out = PROC(text=[text], batch_dna_sequences=[[dna]],
                   max_length_text=256, max_length_dna=32)
        return Request(rid, out.input_ids, out.attention_mask,
                       out.dna_input_ids, out.dna_attention_mask,
                       max_new_tokens=max_new, greedy=True)
    out = PROC(text=[text], batch_dna_sequences=None,
               max_length_text=256, max_length_dna=32)
    return Request(rid, out.input_ids, out.attention_mask,
                   max_new_tokens=max_new, greedy=True)


def _engine_greedy(engine, params, req):
    ids, mask = engine.generate(
        params, req.input_ids, req.attention_mask,
        req.dna_input_ids, req.dna_attention_mask,
        max_new_tokens=req.max_new_tokens, greedy=True)
    # engine pads after EOS with pad id; reconstruct the emitted stream:
    # tokens up to and including the first EOS (or all max_new)
    toks = [int(t) for t, m in zip(ids[0], mask[0]) if m]
    if len(toks) < req.max_new_tokens:
        toks.append(engine.eos_token_id)
    return toks


class TestContinuousBatching:
    def test_matches_engine_greedy_mixed_lengths(self, setup):
        cfg, params, engine = setup
        reqs = [
            _make_request(0, "hello world, this is a longer prompt " * 3),
            _make_request(1, "short"),
            _make_request(2, "dna question", dna="ACGTACGTACGTACGT"),
            _make_request(3, "another prompt of medium length here"),
            _make_request(4, "x" * 100),
        ]
        expected = {r.rid: _engine_greedy(engine, params, r) for r in reqs}

        cb = ContinuousBatcher(params, cfg, eos_token_id=TOK.eos_token_id,
                               capacity=2, max_len=512, prompt_bucket=64)
        done = cb.run(reqs)
        assert len(done) == len(reqs)
        for r in done:
            assert r.tokens == expected[r.rid], (
                f"request {r.rid}: {r.tokens} != {expected[r.rid]}")

    def test_staggered_admission(self, setup):
        """Admit a new request mid-flight; both must still match the engine."""
        cfg, params, engine = setup
        r1 = _make_request(0, "first request prompt text")
        r2 = _make_request(1, "second arrives later")
        e1 = _engine_greedy(engine, params, r1)
        e2 = _engine_greedy(engine, params, r2)

        cb = ContinuousBatcher(params, cfg, eos_token_id=TOK.eos_token_id,
                               capacity=4, max_len=256, prompt_bucket=64)
        assert cb.admit(r1)
        finished = []
        for _ in range(3):                     # r1 decodes alone for 3 steps
            finished += cb.step()
        assert cb.admit(r2)                    # joins at a token boundary
        while cb.active.any():
            finished += cb.step()
        assert r1.tokens == e1
        assert r2.tokens == e2

    def test_slot_reuse(self, setup):
        cfg, params, engine = setup
        cb = ContinuousBatcher(params, cfg, eos_token_id=TOK.eos_token_id,
                               capacity=1, max_len=256, prompt_bucket=64)
        a = _make_request(0, "aaa bbb ccc", max_new=4)
        b = _make_request(1, "ddd eee fff", max_new=4)
        done = cb.run([a, b])
        assert len(done) == 2
        assert a.tokens == _engine_greedy(engine, params, a)
        assert b.tokens == _engine_greedy(engine, params, b)

    def test_decode_window_matches_single_step(self, setup):
        """step_window(k) scans k steps on-device with one host sync; greedy
        outputs must equal the per-token scheduler exactly, across EOS exits,
        max_new overruns discarded mid-window, and slot reuse."""
        cfg, params, engine = setup
        mk = lambda: [
            _make_request(0, "hello world, this is a longer prompt " * 3,
                          max_new=7),
            _make_request(1, "short", max_new=3),
            _make_request(2, "dna question", dna="ACGTACGTACGTACGT", max_new=9),
            _make_request(3, "another prompt of medium length here", max_new=5),
        ]
        base = mk()
        cb1 = ContinuousBatcher(params, cfg, eos_token_id=TOK.eos_token_id,
                                capacity=2, max_len=256, prompt_bucket=64)
        cb1.run(base)                                    # window=1 reference
        for w in (3, 4):
            reqs = mk()
            cbw = ContinuousBatcher(params, cfg, eos_token_id=TOK.eos_token_id,
                                    capacity=2, max_len=256, prompt_bucket=64)
            done = cbw.run(reqs, window=w)
            assert len(done) == len(reqs)
            for got, want in zip(reqs, base):
                assert got.tokens == want.tokens, (
                    f"window={w} rid={got.rid}: {got.tokens} != {want.tokens}")

    def test_warmup_is_state_neutral(self, setup):
        """warmup() precompiles admission buckets + decode windows via
        drop-slot scatters and inactive-row steps; outputs afterwards must
        be identical to a cold batcher's."""
        cfg, params, engine = setup
        mk = lambda: [_make_request(i, f"warm request {i}", max_new=5)
                      for i in range(3)]
        cold = mk()
        ContinuousBatcher(params, cfg, eos_token_id=TOK.eos_token_id,
                          capacity=2, max_len=256, prompt_bucket=64).run(
            cold, window=3)
        warm = mk()
        cb = ContinuousBatcher(params, cfg, eos_token_id=TOK.eos_token_id,
                               capacity=2, max_len=256, prompt_bucket=64)
        cb.warmup([64], dna_shapes=(None,), windows=(1, 3))
        cb.run(warm, window=3)
        for a, b in zip(warm, cold):
            assert a.tokens == b.tokens

    def test_window_headroom_fallback(self, setup):
        """max_len too tight for a full window: falls back to single steps
        and still matches."""
        cfg, params, engine = setup
        a = _make_request(0, "tight headroom request", max_new=6)
        want = _engine_greedy(engine, params, a)
        cb = ContinuousBatcher(params, cfg, eos_token_id=TOK.eos_token_id,
                               capacity=1, max_len=70, prompt_bucket=64)
        cb.run([a], window=8)                 # 64-wide prompt + 6 columns left
        assert a.tokens == want


class TestDeferredAdmission:
    def test_first_token_eos_resolves_via_window(self, setup):
        # admissions defer first-token resolution to the next window; a
        # request whose FIRST token is EOS must come back finished from
        # step_window (the deferred-resolve path), free its slot, and
        # not contaminate the surviving rows
        cfg, params, engine = setup
        probe = _make_request(0, "probe", max_new=4)
        first = _engine_greedy(engine, params, probe)[0]
        cb = ContinuousBatcher(params, cfg, eos_token_id=first,
                               capacity=2, max_len=256, max_new=8,
                               prompt_bucket=64)
        r0 = _make_request(0, "probe", max_new=4)
        r1 = _make_request(1, "another prompt", max_new=4)
        admitted = cb.admit_many([r0, r1])
        assert len(admitted) == 2
        assert cb._pending_first            # resolution actually deferred
        assert not r0.done                  # not known yet
        fin = cb.step_window(4)
        assert r0 in fin and r0.done
        assert r0.tokens == [first]
        # its slot freed; the other request decodes on
        done = cb.run([], window=4)
        assert r1 in done + fin and r1.done
        assert r1.tokens == _engine_greedy(engine, params,
                                           r1)[:len(r1.tokens)]

    def test_max_new_one_resolves_eagerly(self, setup):
        cfg, params, engine = setup
        cb = ContinuousBatcher(params, cfg, eos_token_id=-1,
                               capacity=2, max_len=256, max_new=8,
                               prompt_bucket=64)
        r = _make_request(0, "single token request", max_new=1)
        out = cb.admit_many([r])
        assert not cb._pending_first        # quota rows resolve at admit
        assert out[0].done and len(out[0].tokens) == 1


class TestPipelined:
    """run_pipelined keeps one window in flight; greedy outputs must be
    IDENTICAL to run() in every scheduling regime: churn with slot
    rebinding (quota-finish prediction installs successors before the
    in-flight window resolves), EOS exits mid-window, deferred first
    tokens, and prefix-cache reuse."""

    def _mk_churn(self):
        # capacity 2, six requests with staggered quotas: constant slot
        # rebinding through the predicted-retire path
        return [
            _make_request(0, "hello world, this is a longer prompt " * 3,
                          max_new=7),
            _make_request(1, "short", max_new=3),
            _make_request(2, "dna question", dna="ACGTACGTACGTACGT",
                          max_new=9),
            _make_request(3, "another prompt of medium length here",
                          max_new=5),
            _make_request(4, "x" * 100, max_new=4),
            _make_request(5, "final request in the queue", max_new=6),
        ]

    def test_matches_run_under_churn(self, setup):
        cfg, params, engine = setup
        base = self._mk_churn()
        ContinuousBatcher(params, cfg, eos_token_id=TOK.eos_token_id,
                          capacity=2, max_len=256,
                          prompt_bucket=64).run(base, window=3)
        for w in (1, 3, 4):
            reqs = self._mk_churn()
            cb = ContinuousBatcher(params, cfg,
                                   eos_token_id=TOK.eos_token_id,
                                   capacity=2, max_len=256, prompt_bucket=64)
            done = cb.run_pipelined(reqs, window=w)
            assert len(done) == len(reqs)
            for got, want in zip(reqs, base):
                assert got.tokens == want.tokens, (
                    f"window={w} rid={got.rid}: "
                    f"{got.tokens} != {want.tokens}")

    def test_eos_mid_window(self, setup):
        """EOS inside a window: the device self-deactivates the row, the
        replay truncates at EOS, and the freed slot serves the queue."""
        cfg, params, engine = setup
        probe = _make_request(0, "probe", max_new=8)
        stream = _engine_greedy(engine, params, probe)
        eos = stream[2]                      # fires on step 3 of the probe
        mk = lambda: [_make_request(0, "probe", max_new=8),
                      _make_request(1, "another prompt", max_new=6),
                      _make_request(2, "third in the queue", max_new=6)]
        base = mk()
        ContinuousBatcher(params, cfg, eos_token_id=eos, capacity=2,
                          max_len=256, prompt_bucket=64).run(base, window=4)
        reqs = mk()
        cb = ContinuousBatcher(params, cfg, eos_token_id=eos, capacity=2,
                               max_len=256, prompt_bucket=64)
        done = cb.run_pipelined(reqs, window=4)
        assert len(done) == len(reqs)
        for got, want in zip(reqs, base):
            assert got.tokens == want.tokens

    def test_first_token_eos_pipelined(self, setup):
        """A request whose FIRST token is EOS finishes through the deferred
        resolve while a window is in flight; its slot rebinds cleanly."""
        cfg, params, engine = setup
        probe = _make_request(0, "probe", max_new=4)
        first = _engine_greedy(engine, params, probe)[0]
        mk = lambda: [_make_request(0, "probe", max_new=4),
                      _make_request(1, "another prompt", max_new=4),
                      _make_request(2, "third request text", max_new=4)]
        base = mk()
        ContinuousBatcher(params, cfg, eos_token_id=first, capacity=2,
                          max_len=256, max_new=8,
                          prompt_bucket=64).run(base, window=4)
        reqs = mk()
        cb = ContinuousBatcher(params, cfg, eos_token_id=first, capacity=2,
                               max_len=256, max_new=8, prompt_bucket=64)
        done = cb.run_pipelined(reqs, window=4)
        assert len(done) == len(reqs)
        for got, want in zip(reqs, base):
            assert got.tokens == want.tokens

    def test_prefix_cache_and_dedupe(self, setup):
        """Shared prompts under the pipelined driver: same-batch dedupe and
        cross-run prefix reuse still hold (and still skip prefills)."""
        cfg, params, engine = setup
        want = _engine_greedy(engine, params,
                              _make_request(0, "shared prompt", max_new=5))
        cb = ContinuousBatcher(params, cfg, eos_token_id=TOK.eos_token_id,
                               capacity=4, max_len=256, prompt_bucket=64,
                               prefix_cache=True)
        reqs = [_make_request(i, "shared prompt", max_new=5)
                for i in range(3)]
        done = cb.run_pipelined(reqs, window=2)
        assert len(done) == 3 and cb.prefill_calls == 1
        for r in done:
            assert r.tokens == want
        n = cb.prefill_calls
        later = _make_request(9, "shared prompt", max_new=5)
        cb.run_pipelined([later], window=2)
        assert cb.prefill_calls == n and later.tokens == want

    def test_drain_packing(self, setup):
        """Once the queue drains, live rows pack to the front and the
        decode windows step down the row-bucket ladder (cb); tokens stay
        identical and the pools (shape-stable) serve the next run."""
        cfg, params, engine = setup
        # the long request admits LAST (slot 3): after the shorts finish,
        # the lone live row sits at the back — exactly the layout packing
        # exists to fix (live at slot 0 would shrink cb via hwm alone)
        mk = lambda: [
            _make_request(1, "short a", max_new=2),
            _make_request(2, "short b request", max_new=2),
            _make_request(3, "short c text here", max_new=3),
            _make_request(0, "long request one " * 4, max_new=12),
        ]
        base = mk()
        ContinuousBatcher(params, cfg, eos_token_id=TOK.eos_token_id,
                          capacity=4, max_len=256,
                          prompt_bucket=64).run(base, window=2)
        reqs = mk()
        cb = ContinuousBatcher(params, cfg, eos_token_id=TOK.eos_token_id,
                               capacity=4, max_len=256, prompt_bucket=64)
        assert cb.row_buckets == [1, 2, 4]
        cb.timers = {}
        done = cb.run_pipelined(reqs, window=2)
        assert len(done) == len(reqs)
        for got, want in zip(reqs, base):
            assert got.tokens == want.tokens
        assert cb.capacity == 4                  # shape-stable pools
        assert "pack" in cb.timers               # the drain branch fired
        # a fresh batch runs fine on the packed pools
        again = mk()
        done = cb.run_pipelined(again, window=2)
        for got, want in zip(again, base):
            assert got.tokens == want.tokens

    def test_interop_with_step_window(self, setup):
        """run_pipelined leaves the batcher in a state a subsequent plain
        run() can continue from (dirty-flag handoff)."""
        cfg, params, engine = setup
        a = _make_request(0, "first phase request", max_new=4)
        b = _make_request(1, "second phase request", max_new=4)
        ea = _engine_greedy(engine, params, a)
        eb = _engine_greedy(engine, params, b)
        cb = ContinuousBatcher(params, cfg, eos_token_id=TOK.eos_token_id,
                               capacity=2, max_len=256, prompt_bucket=64)
        cb.run_pipelined([a], window=2)
        cb.run([b], window=2)
        assert a.tokens == ea and b.tokens == eb


class TestPrefixCacheAndPreemption:
    def test_same_batch_dedupe_matches_engine(self, setup):
        """Identical prompts admitted together prefill ONCE (fan-out by
        row-scatter) and still match the engine's greedy output."""
        cfg, params, engine = setup
        reqs = [_make_request(i, "shared grpo-style prompt text", max_new=5)
                for i in range(3)]
        want = _engine_greedy(engine, params, reqs[0])
        cb = ContinuousBatcher(params, cfg, eos_token_id=TOK.eos_token_id,
                               capacity=4, max_len=256, prompt_bucket=64)
        done = cb.run(reqs, window=2)
        assert len(done) == 3
        assert cb.prefill_calls == 1          # one prefill for all three
        for r in done:
            assert r.tokens == want

    def test_prefix_cache_reuse_skips_prefill(self, setup):
        """A finished slot retains its prompt KV; an identical later request
        admits with ZERO prefill calls and matches exactly (greedy)."""
        cfg, params, engine = setup
        a = _make_request(0, "cache me please", max_new=4)
        want = _engine_greedy(engine, params, a)
        cb = ContinuousBatcher(params, cfg, eos_token_id=TOK.eos_token_id,
                               capacity=2, max_len=256, prompt_bucket=64,
                               prefix_cache=True)
        cb.run([a], window=2)
        assert a.tokens == want
        n_prefills = cb.prefill_calls
        b = _make_request(1, "cache me please", max_new=4)
        cb.run([b], window=2)
        assert cb.prefill_calls == n_prefills  # reuse: no new prefill
        assert b.tokens == want

    def test_prefix_cache_eviction_correctness(self, setup):
        """Retained rows are evicted when capacity is needed; a post-eviction
        duplicate request re-prefills and still matches."""
        cfg, params, engine = setup
        cb = ContinuousBatcher(params, cfg, eos_token_id=TOK.eos_token_id,
                               capacity=1, max_len=256, prompt_bucket=64,
                               prefix_cache=True)
        a = _make_request(0, "first unique prompt", max_new=3)
        b = _make_request(1, "second unique prompt", max_new=3)
        a2 = _make_request(2, "first unique prompt", max_new=3)
        cb.run([a], window=2)
        cb.run([b], window=2)                 # evicts a's retained row (C=1)
        cb.run([a2], window=2)                # must re-prefill, still correct
        assert a2.tokens == _engine_greedy(engine, params, a)

    def test_pipelined_preemption_falls_back(self, setup):
        """preempt() marks state dirty; a following run_pipelined must
        resync from the mirrors and still produce the exact trajectory."""
        cfg, params, engine = setup
        a = _make_request(0, "preempt then pipeline", max_new=8)
        want = _engine_greedy(engine, params, a)
        cb = ContinuousBatcher(params, cfg, eos_token_id=TOK.eos_token_id,
                               capacity=2, max_len=256, prompt_bucket=64)
        assert cb.admit(a)
        for _ in range(3):
            cb.step()
        if not a.done:
            cont = cb.preempt(a.slot)
            done = cb.run_pipelined([cont], window=3)
            assert done and done[0].tokens == want

    def test_preemption_resumes_exact_trajectory(self, setup):
        """preempt(slot) -> continuation request; re-admission re-prefills
        prompt+generated and the final greedy stream is identical to an
        uninterrupted run (vLLM recompute-preemption semantics)."""
        cfg, params, engine = setup
        a = _make_request(0, "long running request to preempt", max_new=8)
        want = _engine_greedy(engine, params, a)
        cb = ContinuousBatcher(params, cfg, eos_token_id=TOK.eos_token_id,
                               capacity=2, max_len=256, prompt_bucket=64)
        assert cb.admit(a)
        for _ in range(3):
            cb.step()
        if not a.done:
            cont = cb.preempt(a.slot)
            assert not cb.active.any()
            urgent = _make_request(9, "urgent request", max_new=3)
            cb.run([urgent])                   # freed slot serves a newcomer
            done = cb.run([cont])
            assert done and done[0].tokens == want
        else:
            assert a.tokens == want
