"""Training-data pipeline for the MLT-CNN split classifier.

Reference pipeline (mlt-cnn-python): VTM-11 encodes of BVI-DVC dump
per-CTU PNGs (org/, pred/) + a CSV of (seq, baseQP, poc, x, y, label,
cuQP); MltCtuORPQDataset loads them (mlt_ctu_or_pq_dataset.py:10-89)
with labels {0: no-split, 1: QT, 2: BT_H, 3: BT_V} and the coarse-label
hierarchy gt_to_coarse (:78-89).

Here the extraction is a first-class framework feature: run our own
encoder, harvest (features, label) pairs directly as arrays — no PNG
round trip — and train with models.train on a device mesh.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..codec import hls, encoder as enc_mod, partition


def gt_to_coarse(label: int):
    """Fine class -> (l1, l2, l3) coarse hierarchy
    (mlt_ctu_or_pq_dataset.py:78-89)."""
    if label in (0, 1):
        return label, label, label
    return 1, 2, label


@dataclasses.dataclass
class SplitSamples:
    """SoA training set."""
    org: np.ndarray       # [N, S, S] int
    pred: np.ndarray      # [N, S, S] int (merge predictor; zeros if none)
    poc: np.ndarray       # [N]
    qp: np.ndarray        # [N]
    label: np.ndarray     # [N] fine label {0: no-split, 1: QT, 2: BT_H, 3: BT_V}

    def save(self, path: str):
        np.savez_compressed(path, org=self.org, pred=self.pred,
                            poc=self.poc, qp=self.qp, label=self.label)

    @staticmethod
    def load(path: str) -> "SplitSamples":
        d = np.load(path)
        return SplitSamples(d["org"], d["pred"], d["poc"], d["qp"],
                            d["label"])

    def to_batch(self, idx, bit_depth: int = 10):
        """-> dict for models.train (x NHWC features, poc, qp, labels)."""
        import jax.numpy as jnp
        from . import mlt_cnn
        x = mlt_cnn.make_ctu_features(jnp.asarray(self.org[idx]),
                                      jnp.asarray(self.pred[idx]),
                                      bit_depth)
        l1, l2, l3 = zip(*(gt_to_coarse(int(v)) for v in self.label[idx]))
        return {
            "x": x,
            "poc": jnp.asarray(self.poc[idx], jnp.float32),
            "qp": jnp.asarray(self.qp[idx], jnp.float32),
            "labels": (jnp.asarray(l1, jnp.int32),
                       jnp.asarray(l2, jnp.int32),
                       jnp.asarray(l3, jnp.int32)),
        }


def extract_from_frames(frames: list[np.ndarray], cfg: hls.SeqConfig,
                        qp: int, max_mtt: int = 1) -> SplitSamples:
    """Run the sequential RD encoder on intra frames and harvest the
    CTU-root split decision of the partition search as training labels.

    Labels follow the reference classes: 0 no-split, 1 QT, 2 BT_H,
    3 BT_V (the level-3 head; EncCu.cpp comment at :909-921)."""
    orgs, preds, pocs, qps, labels = [], [], [], [], []
    cs = cfg.ctu_size
    fe = enc_mod.FrameEncoder(cfg)
    for poc, frame in enumerate(frames):
        res = fe.encode_frame(frame, poc=poc, qp=qp)
        # root decision per CTU from the cu-size map
        wmap = (res.cu_map >> 16)
        hmap = res.cu_map & 0xFFFF
        for cy in range(0, cfg.height, cs):
            for cx in range(0, cfg.width, cs):
                gw, gh = int(wmap[cy // 4, cx // 4]), int(hmap[cy // 4, cx // 4])
                if gw == cs and gh == cs:
                    label = 0
                elif gw == cs and gh < cs:
                    label = 2      # first split was horizontal
                elif gw < cs and gh == cs:
                    label = 3      # first split was vertical
                else:
                    label = 1      # QT (both dims reduced)
                orgs.append(frame[cy:cy + cs, cx:cx + cs])
                preds.append(np.zeros((cs, cs), frame.dtype))
                pocs.append(poc)
                qps.append(qp)
                labels.append(label)
    return SplitSamples(np.stack(orgs), np.stack(preds),
                        np.asarray(pocs), np.asarray(qps),
                        np.asarray(labels))


def _root_label(wmap, hmap, cx, cy, cs):
    """CTU-root split class from the committed cu-size map
    (EncCu.cpp:909-921 classes)."""
    gw, gh = int(wmap[cy // 4, cx // 4]), int(hmap[cy // 4, cx // 4])
    if gw == cs and gh == cs:
        return 0
    if gw == cs and gh < cs:
        return 2                      # BT_H at the root
    if gw < cs and gh == cs:
        return 3                      # BT_V at the root
    return 1                          # QT


def extract_from_ra_fused(frames, cfg: hls.SeqConfig, qp: int,
                          gop_size: int = 8, intra_period: int = 16,
                          me_range: int = 16) -> SplitSamples:
    """Fast large-scale extraction: run the fused-search RA encoder
    (the deployment configuration) and harvest CTU-root split labels
    of the inter frames, with the exact deployment features — current
    luma + the L0 reference recon the split_hints_fn would see
    (gop.RandomAccessEncoder split_hints_fn contract). Partial border
    CTUs are skipped (the reference's CNN gate requires the CU fully
    inside the picture, EncCu.cpp:746-756)."""
    from ..codec import gop
    cs = cfg.ctu_size
    feats: dict = {}

    def rec_hints(luma, ref, poc, q):
        if ref is not None:
            feats[poc] = (np.asarray(luma), np.asarray(ref), q)
        return None

    enc = gop.RandomAccessEncoder(
        cfg, gop_size=gop_size, mctf=False, hierarchical_qp=True,
        intra_period=intra_period, search="fused",
        split_hints_fn=rec_hints, me_range=me_range)
    res = enc.encode(frames, qp=qp)
    orgs, preds, pocs, qps, labels = [], [], [], [], []
    for poc, (luma, ref, q) in sorted(feats.items()):
        r = res.recons[poc]
        wmap = r.cu_map >> 16
        hmap = r.cu_map & 0xFFFF
        for cy in range(0, cfg.height - cs + 1, cs):
            for cx in range(0, cfg.width - cs + 1, cs):
                orgs.append(luma[cy:cy + cs, cx:cx + cs])
                preds.append(ref[cy:cy + cs, cx:cx + cs])
                pocs.append(poc)
                qps.append(q)
                labels.append(_root_label(wmap, hmap, cx, cy, cs))
    return SplitSamples(np.stack(orgs), np.stack(preds),
                        np.asarray(pocs), np.asarray(qps),
                        np.asarray(labels))


def extract_from_inter_sequence(frames, cfg: hls.SeqConfig, qp: int,
                                me_range: int = 8) -> SplitSamples:
    """The FastInterCU deployment contract: run the sequential RD
    encoder as an IPPP sequence and harvest the CTU-root split
    decisions of the P slices, with features (org CTU, predictor CTU)
    where the predictor is the previous reconstruction — the same
    feature the batched deployment loop feeds the CNN
    (gop.BatchedSequenceEncoder split_hints_fn(luma, prev_recon,
    poc))."""
    cs = cfg.ctu_size
    # local python ME: the batched whole-frame device search is a TPU
    # path; on a CPU extraction host its XLA compile dominates
    fe = enc_mod.FrameEncoder(cfg, me_range=me_range, batched_me=False)
    orgs, preds, pocs, qps, labels = [], [], [], [], []
    prev = None
    for poc, frame in enumerate(frames):
        if poc == 0:
            prev = fe.encode_frame(frame, poc=0, qp=qp,
                                   slice_type=hls.I_SLICE)
            continue
        res = fe.encode_frame(frame, poc=poc, qp=qp,
                              slice_type=hls.P_SLICE,
                              refs=[(poc - 1, prev)])
        wmap = (res.cu_map >> 16)
        hmap = res.cu_map & 0xFFFF
        for cy in range(0, cfg.height, cs):
            for cx in range(0, cfg.width, cs):
                orgs.append(frame[cy:cy + cs, cx:cx + cs])
                preds.append(prev.recon[cy:cy + cs, cx:cx + cs])
                pocs.append(poc)
                qps.append(qp)
                labels.append(_root_label(wmap, hmap, cx, cy, cs))
        prev = res
    return SplitSamples(np.stack(orgs), np.stack(preds),
                        np.asarray(pocs), np.asarray(qps),
                        np.asarray(labels))
