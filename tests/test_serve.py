import json
import threading
import urllib.request

import jax

from bioreason_tpu.config import FusionConfig, SamplingConfig
from bioreason_tpu.data import BioProcessor, KmerTokenizer, ByteTextTokenizer
from bioreason_tpu.models import init_fusion
from bioreason_tpu.serve import InferenceServer, make_http_server


def make_server(max_batch=4, window_ms=30.0):
    tok = ByteTextTokenizer()
    cfg = FusionConfig.tiny(text_vocab=tok.vocab_size, dna_pad_token_id=tok.dna_pad_id)
    params = init_fusion(jax.random.PRNGKey(0), cfg)
    proc = BioProcessor(tok, KmerTokenizer())
    return InferenceServer(params, cfg, proc,
                           sampling=SamplingConfig(max_new_tokens=8),
                           max_batch=max_batch, batch_window_ms=window_ms,
                           max_new_tokens=8, greedy_default=True).start()


ITEM = {"question": "Which pathway?", "reference_sequence": "ACGTACGTACGT",
        "variant_sequence": "ACGAACGTACGT", "answer": ""}


class TestInferenceServer:
    def test_single_request(self):
        srv = make_server()
        try:
            out = srv.generate(dict(ITEM), max_new_tokens=8)
            assert "completion" in out and "answer" in out
            assert isinstance(out["completion"], str)
        finally:
            srv.stop()

    def test_concurrent_requests_micro_batch(self):
        srv = make_server(max_batch=4, window_ms=200.0)
        results = [None] * 4
        try:
            def call(i):
                results[i] = srv.generate(dict(ITEM), max_new_tokens=8)
            threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=600)
            assert all(r is not None and "completion" in r for r in results)
            # greedy + identical inputs micro-batched together -> identical outputs
            assert len({r["completion"] for r in results}) == 1
        finally:
            srv.stop()

    def test_http_roundtrip(self):
        srv = make_server()
        httpd = make_http_server(srv, port=0)          # ephemeral port
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
                assert json.load(r)["status"] == "ok"
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps({**ITEM, "max_new_tokens": 8, "greedy": True}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=600) as r:
                out = json.load(r)
            assert "completion" in out
        finally:
            httpd.shutdown()
            srv.stop()


class TestContinuousServer:
    def test_continuous_mode_concurrent(self):
        """Continuous (slot-scheduler) serving: concurrent greedy requests
        with identical inputs produce identical completions, and the result
        matches the micro-batching server's output."""
        tok = ByteTextTokenizer()
        cfg = FusionConfig.tiny(text_vocab=tok.vocab_size,
                                dna_pad_token_id=tok.dna_pad_id)
        params = init_fusion(jax.random.PRNGKey(0), cfg)
        proc = BioProcessor(tok, KmerTokenizer())
        micro = InferenceServer(params, cfg, proc,
                                sampling=SamplingConfig(max_new_tokens=8),
                                max_new_tokens=8, greedy_default=True).start()
        cont = InferenceServer(params, cfg, proc,
                               sampling=SamplingConfig(max_new_tokens=8),
                               max_batch=2, max_new_tokens=8,
                               greedy_default=True, continuous=True,
                               slot_len=512).start()
        try:
            want = micro.generate(dict(ITEM), max_new_tokens=8)
            results = [None] * 3
            def call(i):
                results[i] = cont.generate(dict(ITEM), max_new_tokens=8)
            threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=600)
            assert all(r is not None for r in results)
            assert len({r["completion"] for r in results}) == 1
            assert results[0]["completion"] == want["completion"]
        finally:
            micro.stop()
            cont.stop()


class TestGuidedServing:
    PATTERN = r"<answer>(yes|no)</answer>"

    def _mk(self, **kw):
        tok = ByteTextTokenizer()
        cfg = FusionConfig.tiny(text_vocab=tok.vocab_size,
                                dna_pad_token_id=tok.dna_pad_id)
        params = init_fusion(jax.random.PRNGKey(0), cfg)
        proc = BioProcessor(tok, KmerTokenizer())
        return InferenceServer(params, cfg, proc,
                               sampling=SamplingConfig(max_new_tokens=32,
                                                       temperature=1.0,
                                                       top_k=0, top_p=1.0),
                               max_batch=4, batch_window_ms=30.0,
                               max_new_tokens=32, **kw).start()

    def test_server_level_guided_micro_batch(self):
        import re
        srv = self._mk(guided_regex=self.PATTERN)
        try:
            out = srv.generate(dict(ITEM), max_new_tokens=32)
            assert re.fullmatch(self.PATTERN, out["completion"]), out
        finally:
            srv.stop()

    def test_per_request_guided_micro_batch(self):
        import re
        srv = self._mk()
        try:
            out = srv.generate(dict(ITEM), max_new_tokens=32,
                               guided_regex=r"(yes|no)")
            assert re.fullmatch(r"(yes|no)", out["completion"]), out
            # unconstrained request on the same server still works
            out2 = srv.generate(dict(ITEM), max_new_tokens=8)
            assert "completion" in out2
        finally:
            srv.stop()

    def test_server_level_guided_continuous(self):
        import re
        srv = self._mk(guided_regex=self.PATTERN, continuous=True,
                       slot_len=512)
        try:
            out = srv.generate(dict(ITEM), max_new_tokens=32)
            assert re.fullmatch(self.PATTERN, out["completion"]), out
        finally:
            srv.stop()

    def test_per_request_regex_rejected_in_continuous(self):
        import pytest
        srv = self._mk(continuous=True, slot_len=512)
        try:
            with pytest.raises(RuntimeError, match="server-level"):
                srv.generate(dict(ITEM), max_new_tokens=8,
                             guided_regex=r"(yes|no)")
        finally:
            srv.stop()


class TestTieredServing:
    def test_tiers_route_and_match_micro_batch(self):
        """KV depth classes (serve.py:_parse_tiers): short and long prompts
        route to different ContinuousBatcher pools; greedy completions match
        the micro-batch server on BOTH tiers."""
        tok = ByteTextTokenizer()
        cfg = FusionConfig.tiny(text_vocab=tok.vocab_size,
                                dna_pad_token_id=tok.dna_pad_id)
        params = init_fusion(jax.random.PRNGKey(0), cfg)
        proc = BioProcessor(tok, KmerTokenizer())
        short_item = dict(ITEM)
        long_item = {**ITEM,
                     "question": "Which KEGG pathway is most likely disrupted "
                                 "by this variant, considering regulatory "
                                 "context and conservation? " * 4}
        micro = InferenceServer(params, cfg, proc,
                                sampling=SamplingConfig(max_new_tokens=8),
                                max_new_tokens=8, greedy_default=True).start()
        tiered = InferenceServer(params, cfg, proc,
                                 sampling=SamplingConfig(max_new_tokens=8),
                                 max_new_tokens=8, greedy_default=True,
                                 continuous=True,
                                 tiers="2x256,2x768").start()
        try:
            want_s = micro.generate(dict(short_item), max_new_tokens=8)
            want_l = micro.generate(dict(long_item), max_new_tokens=8)
            got = [None, None]

            def call(i, item):
                got[i] = tiered.generate(dict(item), max_new_tokens=8)

            threads = [threading.Thread(target=call, args=(0, short_item)),
                       threading.Thread(target=call, args=(1, long_item))]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=600)
            assert got[0]["completion"] == want_s["completion"]
            assert got[1]["completion"] == want_l["completion"]
        finally:
            micro.stop()
            tiered.stop()

    def test_parse_tiers(self):
        from bioreason_tpu.serve import _parse_tiers
        assert _parse_tiers(None) is None
        assert _parse_tiers("96x640,40x2048") == [(96, 640), (40, 2048)]
        assert _parse_tiers("40x2048,96x640") == [(96, 640), (40, 2048)]
