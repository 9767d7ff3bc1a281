#!/usr/bin/env python
"""MLT-CNN training driver (reference: mlt-cnn-python
train_mltcnn.py + Gap_BigMLT_A_BCD_128x128_ORPQ_b128_Adam_600k.yml).

Stages:
  extract  — encode synthetic clips with the sequential RD encoder
             (CTU 128, MTT at the root) across QPs and harvest
             (org CTU, predictor CTU, poc, qp, root-split label)
  train    — GapBigMltCtu with the staged CE loss, Adam +
             cosine-restart LR, periodic checkpoint + val accuracy

Run on CPU (JAX_PLATFORMS=cpu) to leave the TPU free; the dataset and
checkpoints land under checkpoints/.

Usage:
  python tools/train_mlt.py extract --out checkpoints/mlt_data.npz \
      --clips 8 --frames 12
  python tools/train_mlt.py train --data checkpoints/mlt_data.npz \
      --steps 20000 --batch 32 --out checkpoints/mlt_ctu128
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))


def synth_clip(kind: int, w: int, h: int, n: int, seed: int):
    """Diverse synthetic content: translating textures, moving edges,
    zoomy sinusoids, noise patches — stand-in for BVI-DVC (no external
    data in this environment; documented honestly in the README)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    out = []
    if kind % 4 == 0:           # translating band-limited noise
        big = rng.randint(0, 1024, (h + 4 * n, w + 4 * n)).astype(np.float64)
        for _ in range(3):
            big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)
                   + np.roll(big, -1, 1)) / 4.0
        vx, vy = rng.randint(1, 4), rng.randint(0, 3)
        for t in range(n):
            out.append(big[vy * t:vy * t + h, vx * t:vx * t + w])
    elif kind % 4 == 1:         # moving edges / boxes over gradient
        for t in range(n):
            f = 300 + 0.8 * xx + 0.5 * yy
            for b in range(6):
                bx = (37 * b + 11 * t + rng.randint(0, 3)) % w
                by = (53 * b + 7 * t) % h
                bw, bh = 24 + 8 * (b % 3), 20 + 12 * (b % 2)
                f[by:by + bh, bx:bx + bw] = 150 + 120 * b
            out.append(f + rng.randint(-4, 4, (h, w)))
    elif kind % 4 == 2:         # drifting sinusoids (smooth -> no-split)
        for t in range(n):
            out.append(512 + 280 * np.sin((xx - 2.2 * t) / 23.0)
                       * np.cos((yy - 1.1 * t) / 31.0))
    else:                       # half smooth / half detailed
        big = rng.randint(0, 1024, (h + 4 * n, w + 4 * n)).astype(np.float64)
        for t in range(n):
            f = 400 + 200 * np.sin((xx + 3 * t) / 41.0)
            f[:, w // 2:] = big[2 * t:2 * t + h, t:t + w][:, w // 2:]
            out.append(f)
    return [np.clip(f, 0, 1023).astype(np.int32) for f in out]


def cmd_extract(args):
    from fastintercu_vvc_tpu.codec import hls
    from fastintercu_vvc_tpu.models import data as mdata
    cfg = hls.SeqConfig(
        width=args.width, height=args.height,
        chroma_format=hls.CHROMA_400, ctu_size=128,
        min_qt_intra=32, min_qt_inter=32,
        max_mtt_depth_intra=1, max_mtt_depth_inter=1,
        max_bt_inter=128, qp=32)
    parts = []
    t0 = time.time()
    for c in range(args.clips):
        frames = synth_clip(c, args.width, args.height, args.frames,
                            seed=100 + c)
        for qp in (22, 27, 32, 37):
            s = mdata.extract_from_inter_sequence(frames, cfg, qp,
                                                  me_range=6)
            parts.append(s)
            n = sum(len(p.label) for p in parts)
            print(f"clip {c} qp {qp}: total {n} samples "
                  f"({time.time() - t0:.0f}s)", flush=True)
    out = mdata.SplitSamples(
        np.concatenate([p.org for p in parts]),
        np.concatenate([p.pred for p in parts]),
        np.concatenate([p.poc for p in parts]),
        np.concatenate([p.qp for p in parts]),
        np.concatenate([p.label for p in parts]))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    out.save(args.out)
    hist = np.bincount(out.label, minlength=4)
    print(f"saved {len(out.label)} samples to {args.out}; "
          f"label histogram {hist.tolist()}")


def cmd_train(args):
    import jax
    from fastintercu_vvc_tpu.models import (data as mdata, losses,
                                            mlt_cnn, train)
    ds = mdata.SplitSamples.load(args.data)
    n = len(ds.label)
    rng = np.random.RandomState(0)
    perm = rng.permutation(n)
    n_val = max(64, n // 10)
    val_idx = perm[:n_val]
    tr_idx = perm[n_val:]
    print(f"dataset {n} samples ({len(tr_idx)} train / {n_val} val), "
          f"labels {np.bincount(ds.label, minlength=4).tolist()}")

    model = mlt_cnn.GapBigMltCtu()
    tx = train.make_adam(args.lr)
    state = train.create_train_state(model, jax.random.PRNGKey(10), tx)
    if args.resume and os.path.exists(args.resume):
        state = train.load_checkpoint(args.resume, state)
        print(f"resumed from {args.resume} at step {int(state.step)}")
    step_fn = jax.jit(train.make_train_step(model, tx))

    def val_metrics():
        accs = np.zeros(3)
        nb = 0
        for i in range(0, n_val, args.batch):
            idx = val_idx[i:i + args.batch]
            b = ds.to_batch(idx)
            outs = model.apply(
                {"params": state.params,
                 "batch_stats": state.batch_stats},
                b["x"], b["poc"], b["qp"], train=False)
            accs += np.array([float(losses.accuracy(o, l))
                              for o, l in zip(outs, b["labels"])])
            nb += 1
        return (accs / max(nb, 1)).tolist()

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    for it in range(args.steps):
        idx = tr_idx[rng.randint(0, len(tr_idx), args.batch)]
        state, metrics = step_fn(state, ds.to_batch(idx))
        if (it + 1) % args.log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            print(f"step {int(state.step)} loss {m['loss']:.4f} "
                  f"l3_acc {m['l3_acc']:.3f} "
                  f"({(time.time() - t0) / (it + 1):.2f}s/it)",
                  flush=True)
        if (it + 1) % args.ckpt_every == 0 or it + 1 == args.steps:
            va = val_metrics()
            train.save_checkpoint(
                os.path.join(args.out, "state.ckpt"), state)
            train.save_weights(
                os.path.join(args.out, "weights.msgpack"), state)
            with open(os.path.join(args.out, "metrics.json"), "w") as f:
                json.dump({"step": int(state.step),
                           "val_acc_l1": va[0], "val_acc_l2": va[1],
                           "val_acc_l3": va[2]}, f)
            print(f"ckpt @ step {int(state.step)}: val accs "
                  f"l1 {va[0]:.3f} l2 {va[1]:.3f} l3 {va[2]:.3f}",
                  flush=True)


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    e = sub.add_parser("extract")
    e.add_argument("--out", default="checkpoints/mlt_data.npz")
    e.add_argument("--clips", type=int, default=8)
    e.add_argument("--frames", type=int, default=12)
    e.add_argument("--width", type=int, default=384)
    e.add_argument("--height", type=int, default=256)
    t = sub.add_parser("train")
    t.add_argument("--data", default="checkpoints/mlt_data.npz")
    t.add_argument("--out", default="checkpoints/mlt_ctu128")
    t.add_argument("--steps", type=int, default=20000)
    t.add_argument("--batch", type=int, default=32)
    t.add_argument("--lr", type=float, default=4e-4)
    t.add_argument("--resume", default=None)
    t.add_argument("--log-every", type=int, default=50)
    t.add_argument("--ckpt-every", type=int, default=500)
    args = ap.parse_args()
    if args.cmd == "extract":
        cmd_extract(args)
    else:
        cmd_train(args)


if __name__ == "__main__":
    main()
