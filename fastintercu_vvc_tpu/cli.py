"""Command-line interface (EncoderApp/DecoderApp surface parity).

Reference: App/EncoderApp (encmain.cpp:84, ~4k lines of option parsing in
EncAppCfg.cpp:582). This CLI exposes the working subset and grows with
the framework.

Usage:
  python -m fastintercu_vvc_tpu encode -i in.yuv -b out.bin \
      --width 832 --height 480 --qp 32 --frames 8 [--intra-period 0]
      [--ctu 64] [--chroma400] [--recon rec.yuv]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _cli_seqconfig(args, chroma420):
    from .codec import hls
    return hls.SeqConfig(
        width=args.width, height=args.height, bit_depth=args.bit_depth,
        chroma_format=hls.CHROMA_420 if chroma420 else hls.CHROMA_400,
        ctu_size=args.ctu, min_qt_intra=args.min_qt,
        min_qt_inter=args.min_qt, log2_min_cu=3 if chroma420 else 2,
        max_mtt_depth_intra=args.max_mtt, max_mtt_depth_inter=args.max_mtt,
        qp=args.qp, sao=args.sao, mts_intra=args.mts,
        temporal_mvp=args.tmvp, dep_quant=args.dep_quant,
        alf=args.alf, picture_hash=args.hash,
        transform_skip=args.transform_skip)


def _encode(args) -> int:
    from .codec import gop, hls
    from .utils import yuv

    chroma420 = not args.chroma400
    if args.cfg:
        # VTM/CTC-style layered cfg files (-c a.cfg -c b.cfg),
        # CLI flags override
        from .codec import config as cfgmod
        rcfg = cfgmod.load(args.cfg)
        run = rcfg.run
        args.input = args.input or run.get("input")
        args.bitstream = args.bitstream or run.get("bitstream")
        args.recon = args.recon or run.get("recon")
        if args.frames is None:
            args.frames = run.get("frames")
        if args.width == 0:
            args.width = rcfg.seq.width
        if args.height == 0:
            args.height = rcfg.seq.height
        cfg = rcfg.seq
        cfg.width, cfg.height = args.width, args.height
        cfg.__post_init__()
        args.qp = args.qp if args.qp is not None else cfg.qp
        args.bit_depth = cfg.bit_depth
        if run.get("search_range"):
            args.me_range = min(run["search_range"], 64)
        if not args.input or not args.bitstream:
            print("cfg mode: InputFile/BitstreamFile (or -i/-b) required",
                  file=sys.stderr)
            return 1
        chroma420 = cfg.chroma_format == hls.CHROMA_420
    else:
        if not (args.input and args.bitstream and args.width
                and args.height):
            print("-i/-b/--width/--height required without -c",
                  file=sys.stderr)
            return 1
        args.qp = 32 if args.qp is None else args.qp
        cfg = _cli_seqconfig(args, chroma420)

    if args.trace:
        from .utils import trace as _trace
        _trace.open_trace(args.trace,
                          args.trace_channels.split(",")
                          if args.trace_channels else None)

    # non-multiple-of-8 sources: encode at the padded coded size with a
    # conformance window cropping back (EncApp source-padding parity)
    cw, ch = hls.coded_size(args.width, args.height, cfg.log2_min_cu)
    pad_w, pad_h = cw - args.width, ch - args.height
    if pad_w or pad_h:
        sub = 2 if chroma420 else 1
        cfg.width, cfg.height = cw, ch
        cfg.conf_win_right = pad_w // sub
        cfg.conf_win_bottom = pad_h // sub

    frames = []
    for y, u, v in yuv.read_frames(args.input, args.width, args.height,
                                   args.bit_depth, chroma420=chroma420,
                                   max_frames=args.frames):
        if pad_w or pad_h:
            y = np.pad(y, ((0, pad_h), (0, pad_w)), mode="edge")
            if chroma420:
                u = np.pad(u, ((0, pad_h // 2), (0, pad_w // 2)),
                           mode="edge")
                v = np.pad(v, ((0, pad_h // 2), (0, pad_w // 2)),
                           mode="edge")
        frames.append((y, u, v) if chroma420 else y)
    if not frames:
        print(f"no frames read from {args.input}", file=sys.stderr)
        return 1

    # stats collection needs the final-entropy replay (two_pass) so the
    # op stream exists to account; blockstats rides the same flag
    stats_on = args.stats or args.blockstats
    enc_kwargs = dict(collect_stats=True, two_pass=True) if stats_on \
        else {}

    t0 = time.perf_counter()
    if args.batched:
        # TPU-first pipeline: batched whole-frame search (intra level
        # DP + inter full-search on device) + native-CABAC commit
        se = gop.BatchedSequenceEncoder(cfg, me_range=args.me_range)
        if args.intra_period == 1:
            # all-intra: encode each frame independently
            from .codec import batch_search, encoder
            from .utils.bitstream import annexb
            fe = encoder.FrameEncoder(cfg)
            nals, recons, bits, types = [], [], [], []
            for poc, fr in enumerate(frames):
                luma = fr[0] if chroma420 else fr
                dec = batch_search.search_intra_frame(luma, cfg,
                                                      qp=args.qp)
                r = fe.encode_frame(fr, poc=poc, qp=args.qp,
                                    slice_type=hls.I_SLICE,
                                    decisions=dec)
                frame_nals = gop.split_nals(r.bitstream)
                if poc == 0:
                    nals.extend(frame_nals[:2])
                nals.extend(frame_nals[2:])
                recons.append(r)
                bits.append(r.num_bits)
                types.append("I")
            res = gop.SequenceResult(annexb(nals), recons, bits, types)
        else:
            res = se.encode(frames, qp=args.qp)
    elif args.gop > 1:
        # hierarchical-B random access (CTC-style GOP pyramid with the
        # per-temporal-layer QP cascade and open-GOP CRA anchors)
        depth = max(1, args.gop.bit_length() - 1)
        cfg.num_reorder_pics = max(cfg.num_reorder_pics, depth)
        cfg.max_dec_pic_buffering = max(cfg.max_dec_pic_buffering,
                                        depth + 4)
        se = gop.RandomAccessEncoder(
            cfg, gop_size=args.gop, hierarchical_qp=True,
            intra_period=args.intra_period, me_range=args.me_range,
            **enc_kwargs)
        res = se.encode(frames, qp=args.qp)
    else:
        rc = None
        if args.bitrate:
            from .codec.ratectrl import RateController
            rc = RateController(args.bitrate * 1000, args.fps,
                                args.width, args.height)
        se = gop.SequenceEncoder(cfg, intra_period=args.intra_period,
                                 me_range=args.me_range,
                                 num_refs=args.refs, rate_control=rc,
                                 **enc_kwargs)
        res = se.encode(frames, qp=None if rc else args.qp)
    dt = time.perf_counter() - t0

    with open(args.bitstream, "wb") as f:
        f.write(res.bitstream)
    if args.recon:
        sw, sh = args.width, args.height   # conformance-window crop
        yuv.write_frames(args.recon,
                         ((r.recon[:sh, :sw],
                           r.recon_cb[:sh // 2, :sw // 2]
                           if r.recon_cb is not None else None,
                           r.recon_cr[:sh // 2, :sw // 2]
                           if r.recon_cr is not None else None)
                          for r in res.recons), args.bit_depth)

    maxv = (1 << args.bit_depth) - 1
    lumas = [f[0] if chroma420 else f for f in frames]
    psnrs = [10 * np.log10(maxv ** 2 / max(np.mean(
        (r.recon - o).astype(np.float64) ** 2), 1e-9))
        for r, o in zip(res.recons, lumas)]
    total_bits = sum(res.frame_bits)
    print(f"encoded {len(frames)} frames ({''.join(res.frame_types)}) "
          f"in {dt:.1f}s ({len(frames) / dt:.3f} fps)")
    print(f"total {total_bits} bits, mean PSNR-Y "
          f"{float(np.mean(psnrs)):.2f} dB")
    # Analyze.h-style per-slice-type summary
    for t, e in res.summary(frames, args.bit_depth).items():
        if t == "total":
            continue
        psnr = f" psnr-y {e['psnr_y']:.2f}" if "psnr_y" in e else ""
        print(f"  {t}-slices: {e['frames']:3d} frames, "
              f"avg {e['avg_bits']:.0f} bits{psnr}")

    if stats_on:
        fe = getattr(se, "frame_encoder", None)
        if fe is None or fe.bit_accounting is None:
            print("stats: not available on this encode path",
                  file=sys.stderr)
        else:
            if args.stats:
                from .utils import bitacct
                print(bitacct.format_report(fe.bit_accounting,
                                            total_bits))
                dv = getattr(fe, "commit_div_total", None)
                if dv and dv["leaves"]:
                    pct = 100.0 * (dv["rewritten"] + dv["mode_flip"]) \
                        / dv["leaves"]
                    print(f"search->commit divergence: {pct:.2f}% of "
                          f"{dv['leaves']} inter leaves (rewritten "
                          f"{dv['rewritten']}, mode flips "
                          f"{dv['mode_flip']}, merge re-screens "
                          f"{dv['merge_rescreen']})")
            if args.blockstats:
                from .utils import blockstats
                blockstats.dump_sequence(args.blockstats, fe.maps_log,
                                         args.width, args.height)
                print(f"block statistics -> {args.blockstats}")
    return 0


def _nals(args) -> int:
    from .utils import bittools
    bs = open(args.bitstream, "rb").read()
    total = 0
    for e in bittools.list_nals(bs):
        print(f"{e['name']:<12} tid={e['tid']} {e['bytes']} bytes")
        total += e["bytes"]
    print(f"total {total} bytes")
    return 0


def _sei_remove(args) -> int:
    from .utils import bittools
    bs = open(args.input, "rb").read()
    out = bittools.remove_sei(bs)
    open(args.output, "wb").write(out)
    print(f"{len(bs)} -> {len(out)} bytes")
    return 0


def _parcat(args) -> int:
    from .utils import bittools
    streams = [open(f, "rb").read() for f in args.inputs]
    out = bittools.parcat(streams)
    open(args.output, "wb").write(out)
    print(f"{len(streams)} segments -> {len(out)} bytes")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="fastintercu_vvc_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("encode", help="encode a YUV file to VVC")
    e.add_argument("-i", "--input", default=None)
    e.add_argument("-b", "--bitstream", default=None)
    e.add_argument("-c", "--cfg", action="append", default=[],
                   help="VTM/CTC-style cfg file (repeatable; later "
                        "files and CLI flags override)")
    e.add_argument("--width", type=int, default=0)
    e.add_argument("--height", type=int, default=0)
    e.add_argument("--qp", type=int, default=None)
    e.add_argument("--frames", type=int, default=None)
    e.add_argument("--bit-depth", type=int, default=10)
    e.add_argument("--ctu", type=int, default=64)
    e.add_argument("--min-qt", type=int, default=16)
    e.add_argument("--max-mtt", type=int, default=0)
    e.add_argument("--intra-period", type=int, default=0)
    e.add_argument("--gop", type=int, default=1,
                   help="mini-GOP size >1 = hierarchical-B random "
                        "access with the CTC QP cascade")
    e.add_argument("--me-range", type=int, default=8)
    e.add_argument("--refs", type=int, default=1,
                   help="active reference frames per list")
    e.add_argument("--bitrate", type=int, default=0,
                   help="target bitrate in kbps (R-lambda rate control)")
    e.add_argument("--fps", type=float, default=30.0)
    e.add_argument("--transform-skip", action="store_true",
                   help="enable 4x4 transform skip (screen content)")
    e.add_argument("--hash", action="store_true",
                   help="append decoded-picture-hash (MD5) SEI")
    e.add_argument("--alf", action="store_true",
                   help="enable the adaptive loop filter (luma)")
    e.add_argument("--dep-quant", action="store_true",
                   help="enable dependent quantization")
    e.add_argument("--tmvp", action="store_true",
                   help="enable temporal motion vector prediction")
    e.add_argument("--mts", action="store_true",
                   help="enable explicit intra MTS (DST7/DCT8)")
    e.add_argument("--sao", action="store_true",
                   help="enable SAO in-loop filtering")
    e.add_argument("--batched", action="store_true",
                   help="batched TPU search pipeline + native-CABAC "
                        "commit (IPPP; --intra-period 1 for all-intra)")
    e.add_argument("--chroma400", action="store_true",
                   help="input is luma-only (4:0:0)")
    e.add_argument("--recon", default=None,
                   help="write reconstruction YUV")
    e.add_argument("--trace", default=None,
                   help="write a JSONL encode trace to this path")
    e.add_argument("--trace-channels", default=None,
                   help="comma list: frame,cu,sao,rc (default all)")
    e.add_argument("--stats", action="store_true",
                   help="print per-syntax-element bit accounting "
                        "(CodingStatistics-style) after the encode")
    e.add_argument("--blockstats", default=None, metavar="FILE",
                   help="write per-CU mode/MV block statistics "
                        "(YUView BlockStat format)")
    e.set_defaults(fn=_encode)

    n = sub.add_parser("nals", help="list NAL units of a stream "
                                    "(annexB inventory)")
    n.add_argument("bitstream")
    n.set_defaults(fn=_nals)

    sr = sub.add_parser("sei-remove",
                        help="strip SEI NAL units (SEIRemovalApp)")
    sr.add_argument("input")
    sr.add_argument("output")
    sr.set_defaults(fn=_sei_remove)

    pc = sub.add_parser("parcat", help="concatenate IDR-aligned "
                                       "streams (Parcat)")
    pc.add_argument("inputs", nargs="+")
    pc.add_argument("-o", "--output", required=True)
    pc.set_defaults(fn=_parcat)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
