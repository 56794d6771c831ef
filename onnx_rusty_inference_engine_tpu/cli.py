"""CLI driver.

Replaces the reference's hardcoded `main()` (reference: src/main.rs:9-55,
where model selection is a compile-time comment edit, main.rs:10-24) with a
real flag-driven driver:

    oriet run --model m.onnx --input in.pb [--golden out.pb] [--batch N]
              [--dtype float32|bfloat16] [--quantize int8] [--log-ops]
    oriet bench --model m.onnx [--batch 64] [--steps 50] [--quantize int8]
    oriet inspect --model m.onnx
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional

import numpy as np


def _split_input_spec(spec: str):
    """--input accepts "path.pb" or "name=path.pb". A plain path may itself
    contain '=' (runs/lr=0.1/x.pb), so only split when the whole string is
    not an existing file."""
    if "=" in spec and not os.path.exists(spec):
        name, _, path = spec.partition("=")
        return name, path
    return "", spec


def _build_engine(args, graph=None):
    from .engine import Engine
    from .graph import import_onnx

    graph = graph or import_onnx(args.model)
    if getattr(args, "quantize", None) == "int8":
        from .quant import quantize_graph

        calib = None
        inp = getattr(args, "input", None)
        if inp:
            from . import onnx_io

            feed = {}
            for spec_str in (inp if isinstance(inp, list) else [inp]):
                name, path = _split_input_spec(spec_str)
                t = onnx_io.read_tensor_file(path)
                feed[name or t.name or
                     graph.input_names[len(feed)]] = t.array
            calib = [feed]
        graph = quantize_graph(graph, calibration_inputs=calib)
    elif getattr(args, "quantize", None) == "w8a8":
        # calibration-free dynamic W8A8 (per-row activation scales
        # in-graph) — the MXU-rate lever for matmul-heavy graphs
        from .quant import quantize_matmuls_w8a8

        graph = quantize_matmuls_w8a8(graph)
    return Engine(graph, dtype=getattr(args, "dtype", "float32"))


def cmd_run(args) -> int:
    from . import onnx_io
    from .graph import import_onnx

    graph = import_onnx(args.model)
    engine = _build_engine(args, graph)
    feed = {}
    for spec_str in args.input:
        name, path = _split_input_spec(spec_str)
        t = onnx_io.read_tensor_file(path)
        key = name or args.input_name or t.name or graph.input_names[
            len(feed)]
        x = t.array
        if args.batch and args.batch > 1:
            x = np.repeat(x, args.batch, axis=0)
        feed[key] = x

    if args.log_ops:
        for i, n in enumerate(graph.nodes):
            print(f"[node {i:3d}] {n.op_type:20s} {n.name} "
                  f"{n.inputs} -> {n.outputs}", file=sys.stderr)

    if args.dump_stats or args.dump_tensors:
        # reference debug_prints parity (convolution_op.rs:165-168): surface
        # every intermediate tensor via ONE probe-graph run (debug.py)
        from .debug import dump_intermediates, tensor_stats

        vals = dump_intermediates(graph, feed)
        if args.dump_tensors:
            np.savez(args.dump_tensors, **vals)
            print(f"wrote {len(vals)} tensors to {args.dump_tensors}",
                  file=sys.stderr)
        if args.dump_stats:
            for row in tensor_stats(vals):
                print(json.dumps(row), file=sys.stderr)

    res = engine.run(feed)
    print(json.dumps({
        "outputs": {k: v.reshape(v.shape[0], -1)[:, :16].tolist()
                    for k, v in res.outputs.items()},
        "output_shapes": {k: list(v.shape) for k, v in res.outputs.items()},
        "top1": res.top1().tolist(),
        "latency_s": res.latency_s,
    }, indent=2))

    if args.golden:
        g = onnx_io.read_tensor_file(args.golden)
        out_name = g.name if g.name in res.outputs else next(iter(res.outputs))
        got = res.outputs[out_name][:1].reshape(g.array.shape)
        ok = np.allclose(got, g.array, rtol=args.rtol, atol=args.atol)
        err = float(np.max(np.abs(got - g.array)))
        print(f"golden: {'MATCH' if ok else 'MISMATCH'} (max_abs_err={err:.3e})")
        return 0 if ok else 1
    return 0


def cmd_bench(args) -> int:
    import jax

    from .graph import import_onnx

    graph = import_onnx(args.model)
    engine = _build_engine(args, graph)
    spec = graph.inputs[0]
    shape = list(spec.concrete_shape(batch=args.batch))
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(spec.dtype)
    feed = {spec.name: x}

    from .utils.timing import engine_throughput

    ips = engine_throughput(engine, feed, iters=args.steps)
    print(json.dumps({
        "model": args.model,
        "batch": args.batch,
        "quantize": args.quantize,
        "images_per_sec": round(ips, 2),
        "latency_s_per_batch": round(args.batch / ips, 6),
        "steps": args.steps,
        "device": str(jax.devices()[0]),
    }))
    return 0


def cmd_inspect(args) -> int:
    from .graph import import_onnx
    from .ops import supported_ops

    graph = import_onnx(args.model)
    counts = {}
    for n in graph.nodes:
        counts[n.op_type] = counts.get(n.op_type, 0) + 1
    print(json.dumps({
        "name": graph.name,
        "opset": graph.opset,
        "n_nodes": len(graph.nodes),
        "op_histogram": counts,
        "inputs": [{"name": i.name, "shape": list(i.shape),
                    "dtype": str(i.dtype)} for i in graph.inputs],
        "outputs": graph.outputs,
        "n_weights": len(graph.weight_names),
        "weight_bytes": int(sum(graph.constants[w].nbytes
                                for w in graph.weight_names)),
        "unsupported_ops": sorted(set(counts) - set(supported_ops())),
    }, indent=2))
    return 0


def cmd_serve(args) -> int:
    from .http_serve import serve_http

    engine = _build_engine(args)
    print(f"serving on :{args.port} (POST /v1/infer)", file=sys.stderr)
    serve_http(engine, port=args.port)
    return 0


def cmd_quantize(args) -> int:
    from . import onnx_io
    from .graph import import_onnx, save_graph
    from .quant import quantize_graph

    from .quant import QuantConfig

    graph = import_onnx(args.model)
    calib = None
    if args.calib_input:
        t = onnx_io.read_tensor_file(args.calib_input)
        calib = [{t.name or graph.input_names[0]: t.array}]
    qgraph = quantize_graph(
        graph, calibration_inputs=calib,
        config=QuantConfig(calibration=args.calibration,
                           percentile=args.percentile))
    if args.bias_correct and calib:
        from .quant import bias_correct

        qgraph = bias_correct(qgraph, graph, calib)
    save_graph(args.out, qgraph)
    n_q = sum(1 for n in qgraph.nodes if n.op_type.startswith("QLinear"))
    print(json.dumps({"out": args.out, "qlinear_nodes": n_q,
                      "total_nodes": len(qgraph.nodes)}))
    return 0


def cmd_generate(args) -> int:
    from .generate import Generator

    if args.kv_dtype == "int4" and args.family not in ("gpt2", "llama"):
        print("error: --kv-dtype int4 needs a nibble-packing decode graph "
              "(gpt2/llama families)", file=sys.stderr)
        return 2

    if args.family == "t5":
        from .generate import Seq2SeqGenerator
        from .models.t5 import T5Config

        cfg = T5Config(vocab_size=args.vocab, d_model=args.d,
                       n_layer=args.layers, n_head=args.heads,
                       d_ff=4 * args.d)
        src = np.asarray([int(t) for t in args.prompt_ids.split(",")],
                         dtype=np.int64)[None]
        if args.beam > 1:
            from .generate import Seq2SeqBeamGenerator

            bg = Seq2SeqBeamGenerator(cfg, batch=1, beam=args.beam,
                                      src_len=src.shape[1],
                                      max_len=args.max_len,
                                      device_loop=bool(args.device_loop))
            toks, scores = bg.generate(src, args.new)
            print(json.dumps({"family": "t5", "src": src[0].tolist(),
                              "generated": toks[0].tolist(),
                              "beam": args.beam,
                              "score": round(float(scores[0]), 4)}))
            return 0
        gen = Seq2SeqGenerator(cfg, batch=1, src_len=src.shape[1],
                               max_len=args.max_len,
                               kv_dtype=args.kv_dtype,
                               int4_weights=args.int4)
        toks, _ = gen.generate(src, args.new)
        print(json.dumps({"family": "t5", "src": src[0].tolist(),
                          "generated": toks[0].tolist(),
                          "kv_dtype": args.kv_dtype, "int4": args.int4}))
        return 0

    if args.family == "asr":
        # waveform -> tokens through the full in-graph pipeline (STFT +
        # mel + encoder + cross-KV + cached decoder); synthesizes a sine
        # test tone since token prompts don't apply
        from .generate import Seq2SeqGenerator
        from .models.asr import TINY as ASR_TINY

        n = 512
        t = np.arange(n) / ASR_TINY.sample_rate
        audio = np.sin(2 * np.pi * 200 * t)[None].astype(np.float32)
        gen = Seq2SeqGenerator(ASR_TINY, batch=1, src_len=n,
                               max_len=min(args.max_len,
                                           ASR_TINY.n_positions),
                               family="asr", kv_dtype=args.kv_dtype)
        toks, _ = gen.generate(audio, args.new)
        print(json.dumps({"family": "asr", "n_samples": n,
                          "generated": toks[0].tolist(),
                          "kv_dtype": args.kv_dtype}))
        return 0

    if args.family == "gpt2":
        from .models.gpt2 import GPT2Config

        cfg = GPT2Config(vocab_size=args.vocab, n_positions=args.max_len,
                         n_embd=args.d, n_layer=args.layers,
                         n_head=args.heads)
    elif args.family == "moe":
        from .models.moe import MoEConfig

        cfg = MoEConfig(vocab_size=args.vocab, n_positions=args.max_len,
                        n_embd=args.d, n_layer=args.layers,
                        n_head=args.heads)
    else:
        from .models.llama import LlamaConfig

        cfg = LlamaConfig(vocab_size=args.vocab, max_positions=args.max_len,
                          dim=args.d, n_layer=args.layers,
                          n_head=args.heads,
                          n_kv_head=max(1, args.heads // 2))
    ids = np.asarray([int(t) for t in args.prompt_ids.split(",")],
                     dtype=np.int64)[None]
    if args.beam > 1:
        from .generate import BeamGenerator

        bg = BeamGenerator(cfg, batch=1, beam=args.beam,
                           prompt_len=ids.shape[1], max_len=args.max_len,
                           family=args.family, int4_weights=args.int4,
                           device_loop=bool(args.device_loop))
        toks, scores = bg.generate(ids, args.new)
        print(json.dumps({"family": args.family, "prompt": ids[0].tolist(),
                          "generated": toks[0].tolist(), "beam": args.beam,
                          "score": round(float(scores[0]), 4)}))
        return 0
    if args.draft_layers:
        # lossless speculative decoding: a smaller same-vocab draft
        # proposes, the target verifies each chunk in one call
        from .generate import SpeculativeGenerator
        import dataclasses

        dcfg = dataclasses.replace(cfg, n_layer=args.draft_layers)
        gen = SpeculativeGenerator(
            cfg, dcfg, batch=1, prompt_len=ids.shape[1],
            max_len=args.max_len, k=args.spec_k, family=args.family,
            draft_seed=1)
        toks, _ = gen.generate(ids, args.new)
        print(json.dumps({"family": args.family, "prompt": ids[0].tolist(),
                          "generated": [int(t) for t in toks[0]],
                          "speculative": True,
                          "draft_layers": args.draft_layers,
                          "acceptance_rate": round(gen.acceptance_rate, 3)}))
        return 0
    lkw = {}
    if args.adapters:
        # demo bank: seeded random adapters over the attention+MLP
        # projections; --adapter selects the serving row (0 = base)
        from .graph import import_model
        from .lora import make_adapter_stack
        from .models import decoder_family

        build_prefill = decoder_family(args.family)[0]
        pg = import_model(build_prefill(cfg, batch=1,
                                        seq_len=ids.shape[1]))
        pats = (("attn", "mlp") if args.family in ("gpt2", "moe")
                else ("_wq", "_wk", "_wv", "_wo"))
        lkw = {"lora_bank": make_adapter_stack(
                   pg, n_adapters=args.adapters, rank=args.lora_rank,
                   targets=pats),
               "adapter": args.adapter}
    gen = Generator(cfg, batch=1, prompt_len=ids.shape[1],
                    max_len=args.max_len, kv_dtype=args.kv_dtype,
                    int4_weights=args.int4, family=args.family,
                    prefill_dtype=args.prefill_dtype,
                    device_loop=args.device_loop, **lkw)
    toks, _ = gen.generate(ids, args.new)
    out = {"family": args.family, "prompt": ids[0].tolist(),
           "generated": toks[0].tolist(),
           "kv_dtype": args.kv_dtype, "int4": args.int4}
    if args.adapters:
        out["adapter"] = args.adapter
    print(json.dumps(out))
    return 0


def cmd_serve_llm(args) -> int:
    from .http_serve import serve_generate_http
    from .serve_llm import DecodeServer

    if args.family == "gpt2":
        from .models.gpt2 import GPT2Config

        cfg = GPT2Config(vocab_size=args.vocab, n_positions=args.max_len,
                         n_embd=args.d, n_layer=args.layers,
                         n_head=args.heads)
    elif args.family == "moe":
        from .models.moe import MoEConfig

        cfg = MoEConfig(vocab_size=args.vocab, n_positions=args.max_len,
                        n_embd=args.d, n_layer=args.layers,
                        n_head=args.heads)
    else:
        from .models.llama import LlamaConfig

        cfg = LlamaConfig(vocab_size=args.vocab, max_positions=args.max_len,
                          dim=args.d, n_layer=args.layers, n_head=args.heads,
                          n_kv_head=max(1, args.heads // 2))
    if args.draft_layers:
        # lossless speculative serving: served tokens == target greedy.
        # SpeculativeServer runs fp32 weights/KV with no prompt cache —
        # reject flags it would silently ignore
        bad = [flag for flag, on in (
            ("--kv-dtype", args.kv_dtype != "float32"),
            ("--int4", args.int4),
            ("--len-buckets", bool(args.len_buckets)),
            ("--prefill-dtype", args.prefill_dtype != "float32"),
            ("--prompt-cache", args.prompt_cache)) if on]
        if bad:
            print(f"error: {', '.join(bad)} not supported with "
                  "--draft-layers (SpeculativeServer is fp32, no prompt "
                  "cache)", file=sys.stderr)
            return 2
        import dataclasses

        from .serve_llm import SpeculativeServer

        dcfg = dataclasses.replace(cfg, n_layer=args.draft_layers)
        srv = SpeculativeServer(cfg, dcfg, slots=args.slots,
                                prompt_len=args.prompt_len,
                                max_len=args.max_len, k=args.spec_k,
                                family=args.family, draft_seed=1,
                                multi_step=args.multi_step)
    else:
        lb = ([int(x) for x in args.len_buckets.split(",")]
              if args.len_buckets else None)
        srv = DecodeServer(cfg, slots=args.slots,
                           prompt_len=args.prompt_len,
                           max_len=args.max_len, kv_dtype=args.kv_dtype,
                           int4_weights=args.int4, family=args.family,
                           multi_step=args.multi_step,
                           prompt_cache=args.prompt_cache,
                           prefill_dtype=args.prefill_dtype,
                           len_buckets=lb)
    if args.step_timeout > 0:
        srv.step_timeout = args.step_timeout   # read at dispatcher start
    print(f"serving on :{args.port} (POST /v1/generate)", file=sys.stderr)
    serve_generate_http(srv, port=args.port)
    return 0


def cmd_profile(args) -> int:
    """Collect a TensorBoard-viewable profiler trace of N inference steps.

    HLO ops carry the ONNX node names (engine.py named_scope), so the trace
    maps back to the graph — the structured replacement for the reference's
    per-node stdout log (model_inference.rs:132-135)."""
    import jax

    from .graph import import_onnx
    from .utils.profiling import trace

    graph = import_onnx(args.model)
    engine = _build_engine(args, graph)
    spec = graph.inputs[0]
    rng = np.random.default_rng(0)
    x = rng.standard_normal(
        spec.concrete_shape(batch=args.batch)).astype(spec.dtype)
    feed = {spec.name: x}
    jax.block_until_ready(engine(feed))  # compile outside the trace
    with trace(args.trace_dir):
        for _ in range(args.steps):
            out = engine(feed)
        jax.block_until_ready(out)
    print(json.dumps({"trace_dir": args.trace_dir, "steps": args.steps,
                      "view": f"tensorboard --logdir {args.trace_dir}"}))
    return 0


def cmd_export(args) -> int:
    """AOT-export a model: compiled StableHLO + weights in one artifact
    (export_aot.py). Optionally quantized first; optionally dual-platform."""
    from . import onnx_io
    from .export_aot import export_engine
    from .graph import import_onnx

    graph = import_onnx(args.model)
    engine = _build_engine(args, graph)
    if args.input:
        feed = {}
        for spec_str in args.input:
            name, path = _split_input_spec(spec_str)
            t = onnx_io.read_tensor_file(path)
            feed[name or t.name or graph.input_names[len(feed)]] = t.array
    else:
        rng = np.random.default_rng(0)
        feed = {s.name: rng.standard_normal(
            s.concrete_shape(batch=args.batch)).astype(s.dtype)
            for s in graph.inputs}
    platforms = args.platforms.split(",") if args.platforms else None
    export_engine(engine, feed, args.out, platforms=platforms)
    print(json.dumps({
        "artifact": args.out,
        "bytes": os.path.getsize(args.out),
        "platforms": platforms or ["<current backend>"],
        "inputs": {k: list(np.shape(v)) for k, v in feed.items()},
    }))
    return 0


def cmd_run_exported(args) -> int:
    """Run an AOT artifact — no ONNX importer in the path."""
    import time

    from . import onnx_io
    from .export_aot import load_exported

    m = load_exported(args.artifact)
    feed = {}
    for spec_str in args.input:
        name, path = _split_input_spec(spec_str)
        t = onnx_io.read_tensor_file(path)
        feed[name or t.name or list(m.input_specs)[len(feed)]] = t.array
    t0 = time.perf_counter()
    out = m.run(feed)
    latency = time.perf_counter() - t0
    print(json.dumps({
        "outputs": {k: v.reshape(v.shape[0], -1)[:, :16].tolist()
                    for k, v in out.items()},
        "output_shapes": {k: list(v.shape) for k, v in out.items()},
        "latency_s": latency,
        "platforms": m.platforms,
    }, indent=2))
    if args.golden:
        g = onnx_io.read_tensor_file(args.golden)
        out_name = g.name if g.name in out else next(iter(out))
        got = out[out_name][:1].reshape(g.array.shape)
        ok = np.allclose(got, g.array, rtol=args.rtol, atol=args.atol)
        err = float(np.max(np.abs(got - g.array)))
        print(f"golden: {'MATCH' if ok else 'MISMATCH'} "
              f"(max_abs_err={err:.3e})")
        return 0 if ok else 1
    return 0


def main(argv: Optional[list] = None) -> int:
    p = argparse.ArgumentParser(prog="oriet",
                                description="TPU-native ONNX inference engine")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="run a model on a TensorProto input")
    pr.add_argument("--model", required=True)
    pr.add_argument("--input", required=True, action="append",
                    help="TensorProto .pb; repeatable, optionally name=path")
    pr.add_argument("--golden")
    pr.add_argument("--input-name", dest="input_name")
    pr.add_argument("--batch", type=int, default=1)
    pr.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    pr.add_argument("--quantize", choices=["int8", "w8a8"])
    pr.add_argument("--rtol", type=float, default=1e-4)
    pr.add_argument("--atol", type=float, default=1e-3)
    pr.add_argument("--log-ops", action="store_true",
                    help="per-node log (parity with reference debug_prints)")
    pr.add_argument("--dump-stats", action="store_true",
                    help="print per-intermediate-tensor min/max/mean/shape "
                         "JSON rows to stderr (probe-graph run)")
    pr.add_argument("--dump-tensors", metavar="OUT.npz",
                    help="save every intermediate tensor to a .npz")
    pr.set_defaults(fn=cmd_run)

    pb = sub.add_parser("bench", help="throughput benchmark")
    pb.add_argument("--model", required=True)
    pb.add_argument("--batch", type=int, default=64)
    pb.add_argument("--steps", type=int, default=100)
    pb.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    pb.add_argument("--quantize", choices=["int8", "w8a8"])
    pb.add_argument("--input")
    pb.set_defaults(fn=cmd_bench)

    pi = sub.add_parser("inspect", help="print graph summary")
    pi.add_argument("--model", required=True)
    pi.set_defaults(fn=cmd_inspect)

    pp = sub.add_parser("profile", help="capture a jax.profiler trace with "
                                        "ONNX-node-name correlation")
    pp.add_argument("--model", required=True)
    pp.add_argument("--trace-dir", dest="trace_dir", default="/tmp/oriet_tb")
    pp.add_argument("--batch", type=int, default=8)
    pp.add_argument("--steps", type=int, default=10)
    pp.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    pp.add_argument("--quantize", choices=["int8", "w8a8"])
    pp.add_argument("--input")
    pp.set_defaults(fn=cmd_profile)

    ps = sub.add_parser("serve", help="HTTP inference server "
                                      "(continuous batching)")
    ps.add_argument("--model", required=True)
    ps.add_argument("--port", type=int, default=8000)
    ps.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ps.add_argument("--quantize", choices=["int8", "w8a8"])
    ps.add_argument("--input")
    ps.set_defaults(fn=cmd_serve)

    pg = sub.add_parser("generate",
                        help="greedy decode with the GPT-2 decoder family "
                             "(seeded weights; fixed-cache decode graph)")
    pg.add_argument("--prompt-ids", default="1,2,3,4",
                    help="comma-separated token ids")
    pg.add_argument("--new", type=int, default=8)
    pg.add_argument("--layers", type=int, default=2)
    pg.add_argument("--d", type=int, default=64)
    pg.add_argument("--heads", type=int, default=4)
    pg.add_argument("--vocab", type=int, default=256)
    pg.add_argument("--max-len", dest="max_len", type=int, default=64)
    pg.add_argument("--kv-dtype", dest="kv_dtype", default="float32",
                    choices=["float32", "int8", "int4"],
                    help="KV cache dtype: int8 = in-graph QDQ; int4 = "
                         "nibble-packed [B,H,L,hd/2] cache (gpt2)")
    pg.add_argument("--int4", action="store_true",
                    help="INT4 weight-only quantization")
    pg.add_argument("--prefill-dtype", dest="prefill_dtype",
                    default="float32",
                    choices=["float32", "bfloat16", "w8a8"],
                    help="prefill compute scheme (decoder families): bf16 "
                         "or dynamic W8A8 matmuls (PERF.md)")
    pg.add_argument("--family", default="gpt2",
                    choices=["gpt2", "llama", "moe", "t5", "asr"])
    pg.add_argument("--draft-layers", dest="draft_layers", type=int,
                    default=0,
                    help="enable lossless speculative decoding with an "
                         "N-layer draft of the same family/vocab")
    pg.add_argument("--device-loop", dest="device_loop", type=int,
                    default=0, metavar="K",
                    help="run K decode steps per dispatch on device "
                         "(lax.scan over time, on-device sampling); "
                         "with --beam, any nonzero value runs the whole "
                         "beam loop in one dispatch")
    pg.add_argument("--spec-k", dest="spec_k", type=int, default=4,
                    help="speculation chunk size (draft proposes k-1)")
    pg.add_argument("--beam", type=int, default=1, metavar="K",
                    help="beam search with K beams (decoder families)")
    pg.add_argument("--adapters", type=int, default=0, metavar="N",
                    help="attach a seeded N-adapter LoRA bank (lora.py)")
    pg.add_argument("--adapter", type=int, default=0,
                    help="adapter index to generate with (0 = base)")
    pg.add_argument("--lora-rank", dest="lora_rank", type=int, default=8)
    pg.set_defaults(fn=cmd_generate)

    psl = sub.add_parser("serve-llm",
                         help="HTTP generation server over the "
                              "continuous-batching slot pool")
    psl.add_argument("--port", type=int, default=8001)
    psl.add_argument("--slots", type=int, default=4)
    psl.add_argument("--prompt-len", dest="prompt_len", type=int, default=32)
    psl.add_argument("--layers", type=int, default=2)
    psl.add_argument("--d", type=int, default=64)
    psl.add_argument("--heads", type=int, default=4)
    psl.add_argument("--vocab", type=int, default=256)
    psl.add_argument("--max-len", dest="max_len", type=int, default=128)
    psl.add_argument("--kv-dtype", dest="kv_dtype", default="float32",
                     choices=["float32", "int8", "int4"])
    psl.add_argument("--int4", action="store_true")
    psl.add_argument("--prefill-dtype", dest="prefill_dtype",
                     default="float32",
                     choices=["float32", "bfloat16", "w8a8"],
                     help="bucketed-prefill compute scheme: bf16 (1.69x "
                          "fp32 on chip) or dynamic W8A8 matmuls (2.8x, "
                          "PERF.md)")
    psl.add_argument("--family", default="gpt2",
                     choices=["gpt2", "llama", "moe"])
    psl.add_argument("--multi-step", dest="multi_step", type=int, default=0,
                     metavar="K", help="K decode steps per dispatch (greedy or sampled)")
    psl.add_argument("--len-buckets", dest="len_buckets", default="",
                     metavar="L1,L2,...",
                     help="KV cache length buckets (ascending, ending at "
                          "max-len): the pool runs at the smallest bucket "
                          "covering live requests")
    psl.add_argument("--draft-layers", dest="draft_layers", type=int,
                     default=0, metavar="N",
                     help="serve with lossless speculative decoding: an "
                          "N-layer same-vocab draft proposes, the target "
                          "verifies each chunk (SpeculativeServer)")
    psl.add_argument("--spec-k", dest="spec_k", type=int, default=4)
    psl.add_argument("--prompt-cache", dest="prompt_cache", type=int,
                     default=0, metavar="N",
                     help="cache up to N prompts' KV (LRU): exact-match "
                          "replay skips the prefill; with chunked prefill, "
                          "shared prefixes stream only their suffix")
    psl.add_argument("--step-timeout", dest="step_timeout", type=float,
                     default=0.0, metavar="SECS",
                     help="failure-detection watchdog: a decode step stuck "
                          "past SECS fails pending requests with a clean "
                          "error instead of hanging clients (first "
                          "dispatch/compile exempt; docs/SERVING.md)")
    psl.set_defaults(fn=cmd_serve_llm)

    pe = sub.add_parser("export",
                        help="AOT-export: compiled StableHLO + weights as "
                             "one artifact (load with run-exported; no ONNX "
                             "importer needed at serve time)")
    pe.add_argument("--model", required=True)
    pe.add_argument("--out", required=True, help="artifact path (.npz)")
    pe.add_argument("--batch", type=int, default=1)
    pe.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    pe.add_argument("--quantize", choices=["int8", "w8a8"])
    pe.add_argument("--input", action="append",
                    help="TensorProto .pb fixing input shapes (and int8 "
                         "calibration); default: synthetic at --batch")
    pe.add_argument("--platforms",
                    help='comma-separated lowering targets, e.g. "cpu,tpu" '
                         "(default: current backend)")
    pe.set_defaults(fn=cmd_export)

    pre = sub.add_parser("run-exported",
                         help="run an AOT artifact on a TensorProto input")
    pre.add_argument("--artifact", required=True)
    pre.add_argument("--input", required=True, action="append",
                     help="TensorProto .pb; repeatable, optionally name=path")
    pre.add_argument("--golden")
    pre.add_argument("--rtol", type=float, default=1e-4)
    pre.add_argument("--atol", type=float, default=1e-3)
    pre.set_defaults(fn=cmd_run_exported)

    pq = sub.add_parser("quantize",
                        help="offline INT8 PTQ: write a QLinear ONNX file")
    pq.add_argument("--model", required=True)
    pq.add_argument("--out", required=True)
    pq.add_argument("--calib-input", dest="calib_input",
                    help="TensorProto .pb used for range calibration")
    pq.add_argument("--calibration", default="minmax",
                    choices=["minmax", "percentile", "mse"],
                    help="activation-range calibration method")
    pq.add_argument("--percentile", type=float, default=99.99)
    pq.add_argument("--bias-correct", dest="bias_correct",
                    action="store_true",
                    help="DFQ-style sequential bias correction")
    pq.set_defaults(fn=cmd_quantize)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
