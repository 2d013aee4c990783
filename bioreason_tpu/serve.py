"""Inference serving: HTTP server over the jitted generation engine.

The reference's serving story is vLLM on a dedicated GPU
(grpo_config.py:230-281, demo_grpo.py:366-425). Here serving is the same
KV-cached engine used for training rollouts, wrapped in a stdlib HTTP server
with request micro-batching: concurrent requests arriving within
`batch_window_ms` are padded into one batch and generated in a single device
call (shape-bucketed so repeated jits stay cached).

Endpoints:
  POST /generate  {"question": str, "reference_sequence": str,
                   "variant_sequence": str, "max_new_tokens"?: int,
                   "greedy"?: bool}
              ->  {"completion": str, "answer": str}
  GET  /healthz ->  {"status": "ok"}

Run: python -m bioreason_tpu.serve --decoder tiny --encoder tiny --port 8787
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

import numpy as np

from bioreason_tpu.config import FusionConfig, SamplingConfig
from bioreason_tpu.data.chat_template import render_chat
from bioreason_tpu.data.kegg import format_kegg_prompt_only
from bioreason_tpu.data.processor import BioProcessor
from bioreason_tpu.generate.engine import GenerationEngine
from bioreason_tpu.train.rewards import extract_answer


def _bucket(n: int, multiple: int = 128) -> int:
    return ((max(n, 1) + multiple - 1) // multiple) * multiple


def _parse_tiers(spec: Optional[str]):
    """'96x640,40x2048' -> [(96, 640), (40, 2048)], sorted by depth.

    KV depth classes for continuous serving (see InferenceServer docstring):
    each class is a ContinuousBatcher pool of `cap` slots x `len` prompt
    tokens; requests route to the shallowest class that fits. HBM scales
    with sum(cap_i * (len_i + max_new)) instead of C * (P_max + max_new)."""
    if not spec:
        return None
    tiers = []
    for part in spec.split(","):
        cap, _, mlen = part.strip().partition("x")
        tiers.append((int(cap), int(mlen)))
    if not tiers:
        return None
    return sorted(tiers, key=lambda t: t[1])


class InferenceServer:
    def __init__(self, params: Dict, fusion_cfg: FusionConfig,
                 processor: BioProcessor,
                 sampling: SamplingConfig = SamplingConfig(),
                 max_batch: int = 8, batch_window_ms: float = 20.0,
                 max_new_tokens: int = 256, greedy_default: bool = False,
                 continuous: bool = False, slot_len: int = 2048,
                 guided_regex: Optional[str] = None, kv_int8: bool = False,
                 decode_window: int = 1, tiers: Optional[str] = None):
        """`continuous=True` switches from window micro-batching to the
        vLLM-style slot scheduler (generate/continuous.py): requests join
        the running decode at token boundaries instead of waiting for the
        next window, and short completions free their slot immediately —
        latency under mixed loads no longer quantizes to the longest
        completion in a window.

        `guided_regex`: server-level constrained-decoding pattern (vLLM
        guided decoding equivalent, generate/guided.py) applied to every
        request; micro-batch mode additionally honors a per-request
        "guided_regex" field (requests are grouped by pattern per batch).

        `tiers`: continuous-mode KV DEPTH CLASSES — "CAPxLEN,CAPxLEN,..."
        (e.g. "96x640,40x2048") builds one ContinuousBatcher pool per class
        and routes each request to the shallowest class whose prompt depth
        fits. The vLLM counterpart is paged KV (the reference inherits it
        via grpo_config.py:230-258); fixed [C,P_max] pools strand
        HBM ∝ C·P_max on short prompts and hard-cap capacity (the r4 wall:
        128 slots at 15.75 GB). Depth classes are the TPU-friendly middle
        ground: static shapes per pool (no per-token page tables in the
        kernel hot path), capacity >128 at the same HBM for mixed loads.
        Overrides max_batch/slot_len when set."""
        self.params = params
        self.cfg = fusion_cfg
        self.processor = processor
        self.sampling = sampling
        self.max_batch = max_batch
        self.batch_window_s = batch_window_ms / 1000.0
        self.max_new_tokens = max_new_tokens
        self.greedy_default = greedy_default
        self.continuous = continuous
        self.slot_len = slot_len
        self.kv_int8 = kv_int8
        self.tiers = _parse_tiers(tiers)
        # decode steps per host round trip in continuous mode: >1 amortizes
        # the scheduling sync over k tokens (throughput) at the cost of up
        # to k-1 steps of admission latency for queued requests
        self.decode_window = max(1, decode_window)
        self.engine = GenerationEngine(
            fusion_cfg, eos_token_id=processor.text_tokenizer.eos_token_id,
            kv_int8=kv_int8)
        self.guided_regex = guided_regex
        self._guided_cache: Dict[str, Any] = {}
        self._queue: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(
            target=self._continuous_loop if continuous else self._batch_loop,
            daemon=True)
        self._rng_counter = 0

    # -- batching worker ------------------------------------------------

    def start(self):
        self._worker.start()
        return self

    def stop(self):
        self._stop.set()
        self._worker.join(timeout=5)

    def _batch_loop(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.batch_window_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                self._run_batch(batch)
            except Exception as e:                      # pragma: no cover
                for req in batch:
                    req["error"] = str(e)
                    req["event"].set()

    def _continuous_loop(self):
        from bioreason_tpu.generate.continuous import ContinuousBatcher, Request
        tier_shapes = self.tiers or [(self.max_batch, self.slot_len)]
        cbs = [ContinuousBatcher(self.params, self.cfg,
                                 eos_token_id=self.processor.text_tokenizer.eos_token_id,
                                 capacity=cap, max_len=mlen,
                                 max_new=self.max_new_tokens,
                                 sampling=self.sampling,
                                 guided=self._spec_for(self.guided_regex),
                                 kv_int8=self.kv_int8)
               for cap, mlen in tier_shapes]
        # startup precompile: the decode window (hit immediately and shared
        # by all requests). Admission shapes depend on request prompt widths
        # and compile lazily; servers with a known width profile can call
        # cb.warmup(prompt_widths=[...]) for full vLLM-style precompile.
        for cb in cbs:
            cb.warmup([], windows=(self.decode_window,))
        pending: Dict[int, List[Any]] = {i: [] for i in range(len(cbs))}
        rid = 0
        by_rid: Dict[int, Dict[str, Any]] = {}

        def route(r) -> int:
            """Shallowest depth class whose prompt pool fits this prompt."""
            plen = r.input_ids.shape[1]
            for i, cb in enumerate(cbs):
                if plen <= cb.max_len:
                    return i
            raise ValueError(f"prompt length {plen} exceeds every tier "
                             f"({[cb.max_len for cb in cbs]})")

        def to_request(req: Dict[str, Any]):
            nonlocal rid
            if (req.get("guided_regex")
                    and req["guided_regex"] != self.guided_regex):
                raise ValueError(
                    "continuous mode supports a server-level --guided_regex "
                    "only (per-slot tables are shared); use micro-batch mode "
                    "for per-request patterns")
            ex = format_kegg_prompt_only(req["item"])
            rendered = render_chat(ex["prompt"], add_generation_prompt=True)
            out = self.processor(
                text=[rendered], batch_dna_sequences=[ex["dna_sequences"]],
                max_length_text=self.cfg.max_length_text,
                max_length_dna=self.cfg.max_length_dna, padding_side="left")
            rid += 1
            by_rid[rid] = req
            return Request(rid, out.input_ids, out.attention_mask,
                           out.dna_input_ids, out.dna_attention_mask,
                           max_new_tokens=min(req.get("max_new_tokens")
                                              or self.max_new_tokens,
                                              self.max_new_tokens),
                           greedy=req.get("greedy", self.greedy_default))

        def deliver(r):
            req = by_rid.pop(r.rid)
            tok = self.processor.text_tokenizer
            text = tok.decode([t for t in r.tokens], skip_special_tokens=True)
            req["result"] = {"completion": text, "answer": extract_answer(text)}
            req["event"].set()

        while not self._stop.is_set():
            while True:
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    break
                try:
                    r = to_request(req)
                    pending[route(r)].append(r)
                except Exception as e:       # bad request: fail it, keep serving
                    req["error"] = str(e)
                    req["event"].set()
            try:
                for i, cb in enumerate(cbs):
                    for r in cb.admit_many(pending[i]):   # shape-grouped prefill
                        if r.done:
                            deliver(r)
                    if cb.active.any():
                        for r in (cb.step_window(self.decode_window)
                                  if self.decode_window > 1 else cb.step()):
                            deliver(r)
            except Exception as e:                       # pragma: no cover
                for r in list(by_rid.values()):
                    r["error"] = str(e)
                    r["event"].set()
                by_rid.clear()
                for lst in pending.values():
                    lst.clear()
            if (not any(cb.active.any() for cb in cbs)
                    and not any(pending.values())):
                time.sleep(0.005)

    def _spec_for(self, pattern: Optional[str]):
        if not pattern:
            return None
        if pattern not in self._guided_cache:
            from bioreason_tpu.generate.guided import guided_spec_for
            self._guided_cache[pattern] = guided_spec_for(
                self.processor.text_tokenizer, pattern)
        return self._guided_cache[pattern]

    def _run_batch(self, reqs: List[Dict[str, Any]]):
        # one engine call per distinct constraint pattern (usually one group)
        by_regex: Dict[Optional[str], List[Dict[str, Any]]] = {}
        for r in reqs:
            by_regex.setdefault(r.get("guided_regex") or self.guided_regex,
                                []).append(r)
        for pattern, group in by_regex.items():
            self._run_group(group, self._spec_for(pattern))

    def _run_group(self, reqs: List[Dict[str, Any]], guided=None):
        import jax

        examples = [format_kegg_prompt_only(r["item"]) for r in reqs]
        rendered = [render_chat(ex["prompt"], add_generation_prompt=True)
                    for ex in examples]
        out = self.processor(
            text=rendered,
            batch_dna_sequences=[ex["dna_sequences"] for ex in examples],
            max_length_text=self.cfg.max_length_text,
            max_length_dna=self.cfg.max_length_dna,
            padding_side="left")
        # bucket the padded width so repeated jits stay cached across batches
        width = _bucket(out.input_ids.shape[1])
        if width != out.input_ids.shape[1]:
            pad = width - out.input_ids.shape[1]
            out.input_ids = np.pad(out.input_ids, ((0, 0), (pad, 0)),
                                   constant_values=self.processor.text_tokenizer.pad_token_id)
            out.attention_mask = np.pad(out.attention_mask, ((0, 0), (pad, 0)))
        mnt = max(r.get("max_new_tokens") or self.max_new_tokens for r in reqs)
        greedy = all(r.get("greedy", self.greedy_default) for r in reqs)
        self._rng_counter += 1
        ids, mask = self.engine.generate(
            self.params, out.input_ids, out.attention_mask,
            out.dna_input_ids, out.dna_attention_mask,
            sampling=self.sampling, max_new_tokens=mnt, greedy=greedy,
            rng=jax.random.PRNGKey(self._rng_counter), guided=guided)
        tok = self.processor.text_tokenizer
        for i, req in enumerate(reqs):
            text = tok.decode(ids[i][mask[i].astype(bool)], skip_special_tokens=True)
            req["result"] = {"completion": text, "answer": extract_answer(text)}
            req["event"].set()

    # -- public sync API (used by the HTTP handler and tests) ------------

    def generate(self, item: Dict[str, Any], max_new_tokens: Optional[int] = None,
                 greedy: Optional[bool] = None, timeout: float = 600.0,
                 guided_regex: Optional[str] = None) -> Dict[str, str]:
        req = {"item": item, "max_new_tokens": max_new_tokens,
               "greedy": self.greedy_default if greedy is None else greedy,
               "guided_regex": guided_regex,
               "event": threading.Event()}
        self._queue.put(req)
        if not req["event"].wait(timeout):
            raise TimeoutError("generation timed out")
        if "error" in req:
            raise RuntimeError(req["error"])
        return req["result"]


def make_http_server(server: InferenceServer, port: int = 8787) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):                       # quiet
            pass

        def _send(self, code: int, payload: Dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(length))
                item = {
                    "question": payload["question"],
                    "reference_sequence": payload.get("reference_sequence", ""),
                    "variant_sequence": payload.get("variant_sequence", ""),
                    "answer": "",
                }
                result = server.generate(item,
                                         max_new_tokens=payload.get("max_new_tokens"),
                                         greedy=payload.get("greedy"),
                                         guided_regex=payload.get("guided_regex"))
                self._send(200, result)
            except Exception as e:
                self._send(400, {"error": str(e)})

    return ThreadingHTTPServer(("0.0.0.0", port), Handler)


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    from bioreason_tpu.cli.common import (DECODER_PRESETS, build_encoder_config,
                                          HYENA_PRESETS, ENCODER_PRESETS)
    p.add_argument("--decoder", default="qwen3-0.6b", choices=sorted(DECODER_PRESETS))
    p.add_argument("--encoder", default="nt-500m",
                   choices=sorted(ENCODER_PRESETS) + sorted(HYENA_PRESETS))
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--max_new_tokens", type=int, default=256)
    p.add_argument("--max_length_dna", type=int, default=2048)
    p.add_argument("--cpu_devices", type=int, default=0)
    p.add_argument("--continuous", action="store_true",
                   help="vLLM-style continuous batching (slot scheduler) "
                        "instead of window micro-batching")
    p.add_argument("--int8", action="store_true",
                   help="serve int8-quantized base weights (QLoRA-style "
                        "per-channel storage, train/quant.py): decode is "
                        "weights-bandwidth-bound, so halving resident bytes "
                        "raises token throughput and frees HBM for slots")
    p.add_argument("--kv_int8", action="store_true",
                   help="int8 KV cache: halves cache HBM (2x continuous-"
                        "batching slots / longer completions at fixed "
                        "memory); ~5% slower at weights-dominated shapes")
    p.add_argument("--guided_regex", default=None,
                   help="constrain every completion to match this regex "
                        "(vLLM guided-decoding equivalent; per-request "
                        "'guided_regex' also accepted in micro-batch mode)")
    p.add_argument("--fuse", action="store_true",
                   help="fused qkv/gateup projection kernels (train/fuse.py: "
                        "one wide MXU dot per projection group)")
    p.add_argument("--w8a8", action="store_true",
                   help="int8 activations on top of --int8 weights "
                        "(cfg.act_int8): prefill dots on the int8 MXU; "
                        "decode stays weight-only int8")
    p.add_argument("--slot_len", type=int, default=2048,
                   help="per-slot KV length (continuous mode)")
    p.add_argument("--tiers", default=None,
                   help="continuous-mode KV depth classes 'CAPxLEN,CAPxLEN' "
                        "(e.g. '96x640,40x2048'): per-class slot pools with "
                        "length-based routing — capacity beyond one deep "
                        "pool at the same HBM (vLLM paged-KV role)")
    p.add_argument("--decode_window", type=int, default=1,
                   help="continuous mode: decode steps per host sync "
                        "(throughput lever; adds <=N-1 steps of admission "
                        "latency)")
    args = p.parse_args(argv)

    if args.cpu_devices:
        from bioreason_tpu.utils import force_cpu_devices
        force_cpu_devices(args.cpu_devices)

    import jax
    from bioreason_tpu.data.text_tokenizer import ByteTextTokenizer
    from bioreason_tpu.models import init_fusion

    tok = ByteTextTokenizer()
    kind, enc, hyena, dna_tok = build_encoder_config(args.encoder)
    if args.w8a8:
        if not args.int8:
            p.error("--w8a8 requires --int8 (act_int8 needs int8 kernels)")
        import dataclasses
        if enc is not None:
            enc = dataclasses.replace(enc, act_int8=True)
    dec_cfg = DECODER_PRESETS[args.decoder](vocab_size=tok.vocab_size)
    if args.w8a8:
        import dataclasses
        dec_cfg = dataclasses.replace(dec_cfg, act_int8=True)
    cfg = FusionConfig(decoder=dec_cfg,
                       encoder=enc, hyena=hyena, encoder_kind=kind,
                       dna_pad_token_id=tok.dna_pad_id,
                       max_length_dna=args.max_length_dna)
    proc = BioProcessor(tok, dna_tok)
    params = init_fusion(jax.random.PRNGKey(0), cfg)
    if args.checkpoint:
        from bioreason_tpu.train.checkpoint import load_checkpoint
        from bioreason_tpu.train.lora import merge_lora
        params = merge_lora(load_checkpoint(args.checkpoint, like=None) or params)
    if args.int8:
        from bioreason_tpu.train.quant import quantize_frozen_int8
        params = quantize_frozen_int8(params, include_embed=True)
    if args.fuse:
        from bioreason_tpu.train.fuse import fuse_projections
        params = fuse_projections(params)

    server = InferenceServer(params, cfg, proc, max_batch=args.max_batch,
                             max_new_tokens=args.max_new_tokens,
                             continuous=args.continuous,
                             slot_len=args.slot_len, tiers=args.tiers,
                             guided_regex=args.guided_regex,
                             kv_int8=args.kv_int8,
                             decode_window=args.decode_window).start()
    httpd = make_http_server(server, args.port)
    print(f"serving on :{args.port} (POST /generate, GET /healthz)")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
