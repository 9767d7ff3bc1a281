#!/usr/bin/env python
"""One-process CNN pipeline: extract -> train -> deploy-measure.

Runs the whole MLT-CNN loop in a single process (the TPU tunnel here
serves one client with slow hand-offs, so process churn is expensive):

  1. extract: fused-search RA encodes of synthetic clips across QPs,
     harvesting CTU-root split labels + deployment features
  2. train: GapBigMltCtu with run-length-scaled staged CE and
     inverse-frequency class balancing; confusion-matrix validation
  3. measure: encode a held-out clip with hints ON vs OFF and report
     the speedup / bit delta (the paper's headline trade)

Usage: python tools/cnn_pipeline.py [--clips N] [--frames N]
       [--steps N] [--out DIR]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=12)
    ap.add_argument("--frames", type=int, default=33)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=4e-4)
    ap.add_argument("--data", default="checkpoints/mlt_data_ra.npz")
    ap.add_argument("--out", default="checkpoints/mlt_ctu128_r3")
    ap.add_argument("--skip-extract", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-measure", action="store_true")
    args = ap.parse_args()

    from fastintercu_vvc_tpu.codec import gop, hls
    from fastintercu_vvc_tpu.models import data as mdata
    import train_mlt

    # ---- 1. extract -------------------------------------------------
    if not args.skip_extract:
        cfg = hls.SeqConfig(
            width=args.width, height=args.height,
            chroma_format=hls.CHROMA_400, ctu_size=128,
            min_qt_intra=8, min_qt_inter=8, log2_min_cu=3,
            max_mtt_depth_intra=3, max_mtt_depth_inter=3,
            max_bt_intra=32, max_bt_inter=64, max_tt_intra=32,
            max_tt_inter=64, qp=32,
            num_reorder_pics=3, max_dec_pic_buffering=6)
        parts = []
        t0 = time.time()
        for c in range(args.clips):
            frames = train_mlt.synth_clip(c, args.width, args.height,
                                          args.frames, seed=500 + 7 * c)
            for qp in (22, 27, 32, 37):
                s = mdata.extract_from_ra_fused(
                    frames, cfg, qp, gop_size=8, intra_period=16)
                parts.append(s)
                n = sum(len(p.label) for p in parts)
                print(f"clip {c} qp {qp}: total {n} samples "
                      f"({time.time() - t0:.0f}s)", flush=True)
        ds = mdata.SplitSamples(
            np.concatenate([p.org for p in parts]),
            np.concatenate([p.pred for p in parts]),
            np.concatenate([p.poc for p in parts]),
            np.concatenate([p.qp for p in parts]),
            np.concatenate([p.label for p in parts]))
        os.makedirs(os.path.dirname(args.data), exist_ok=True)
        ds.save(args.data)
        print(f"saved {len(ds.label)} samples; histogram "
              f"{np.bincount(ds.label, minlength=4).tolist()}",
              flush=True)

    # ---- 2. train ---------------------------------------------------
    if not args.skip_train:
        targs = argparse.Namespace(
            data=args.data, out=args.out, steps=args.steps,
            batch=args.batch, lr=args.lr, resume=None, log_every=200,
            ckpt_every=2000, balance=True)
        train_mlt.cmd_train(targs)

    # ---- 3. measure the deployment trade ----------------------------
    if not args.skip_measure:
        from fastintercu_vvc_tpu.models import pruning
        w, h, nf = 512, 256, 17
        frames = [train_mlt.synth_clip(4, w, h, nf, seed=9191)[i]
                  for i in range(nf)]
        cfg = hls.SeqConfig(
            width=w, height=h, chroma_format=hls.CHROMA_400,
            ctu_size=128, min_qt_intra=8, min_qt_inter=8,
            log2_min_cu=3, max_mtt_depth_intra=3,
            max_mtt_depth_inter=3, max_bt_intra=32, max_bt_inter=64,
            max_tt_intra=32, max_tt_inter=64, qp=32,
            num_reorder_pics=3, max_dec_pic_buffering=6)
        res = {}
        for name, fn in (("off", None),
                         ("on", pruning.make_hints_fn(args.out))):
            enc = gop.RandomAccessEncoder(
                cfg, gop_size=8, mctf=False, hierarchical_qp=True,
                intra_period=16, me_range=16, search="fused",
                split_hints_fn=fn)
            enc.encode(frames[:3], qp=32)        # warm the jits
            t0 = time.time()
            r = enc.encode(frames, qp=32)
            dt = time.time() - t0
            mse = np.mean([(np.asarray(fr, np.float64)
                            - rr.recon) ** 2
                           for fr, rr in zip(frames, r.recons)])
            res[name] = {"fps": nf / dt,
                         "bits": len(r.bitstream) * 8,
                         "psnr": 10 * np.log10(1023 ** 2 / mse)}
            print(f"hints {name}: {res[name]}", flush=True)
        trade = {
            "speedup": res["on"]["fps"] / res["off"]["fps"],
            "bit_delta_pct": 100.0 * (res["on"]["bits"]
                                      / res["off"]["bits"] - 1.0),
            "psnr_delta_db": res["on"]["psnr"] - res["off"]["psnr"],
        }
        print("deployment trade:", json.dumps(trade), flush=True)
        with open(os.path.join(args.out, "deploy_trade.json"),
                  "w") as f:
            json.dump({**trade, "off": res["off"], "on": res["on"]},
                      f, indent=1)


if __name__ == "__main__":
    main()
