#!/usr/bin/env python
"""Learn a decorrelated rBRIEF sampling pattern (ORB-paper greedy).

Offline tool: samples corner-rich 40x40 patches from synthetic
textures, evaluates a large pool of candidate point-pairs, and greedily
selects 256 whose bit means are near 0.5 with bounded pairwise
correlation — the same construction the ORB paper uses to learn
bit_pattern_31. Output: kbslam/frontend/brief_pattern_learned.npy,
picked up automatically by kbslam.frontend.brief.brief_pattern().

Usage: python tools/learn_brief_pattern.py [out.npy]
"""
import os
import sys

import numpy as np
from scipy.ndimage import gaussian_filter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from kbslam.io.synthetic import _texture  # noqa: E402


def collect_patches(n_textures=6, per_texture=400):
    patches = []
    for seed in range(n_textures):
        tex = _texture(np.random.default_rng(seed), size=512).mean(-1)
        gx = np.abs(np.diff(tex, axis=1))[:-1, :]
        gy = np.abs(np.diff(tex, axis=0))[:, :-1]
        score = gx * gy
        ys, xs = np.unravel_index(
            np.argsort(score.ravel())[-per_texture:], score.shape)
        for y, x in zip(ys, xs):
            if 20 <= y < 492 and 20 <= x < 492:
                patches.append(tex[y - 20:y + 20, x - 20:x + 20])
    # blur like the descriptor path (7x7 sigma 2)
    return gaussian_filter(np.stack(patches), sigma=(0, 2.0, 2.0))


def learn(patches, n_bits=256, n_candidates=12000, clip=13, seed=0):
    rng = np.random.default_rng(seed)
    flat = patches.reshape(len(patches), -1)
    sig = 31.0 / 5.0
    cand = np.clip(np.rint(rng.normal(0, sig, size=(n_candidates, 4))),
                   -clip, clip).astype(int)
    cand = np.unique(cand, axis=0)
    cand = cand[~((cand[:, 0] == cand[:, 2]) & (cand[:, 1] == cand[:, 3]))]
    idx = lambda x, y: (y + 20) * 40 + (x + 20)
    bits = (flat[:, idx(cand[:, 2], cand[:, 3])]
            > flat[:, idx(cand[:, 0], cand[:, 1])]).astype(np.float32)
    mean = bits.mean(0)
    good = (mean > 0.25) & (mean < 0.75) & (bits.std(0) > 0.05)
    cand, bits, mean = cand[good], bits[:, good], mean[good]

    order = np.argsort(np.abs(mean - 0.5))
    B = bits - bits.mean(0)
    Bn = B / (np.linalg.norm(B, axis=0) + 1e-9)
    sel, sel_vecs, thr = [], [], 0.2
    while len(sel) < n_bits and thr <= 1.0:
        for ci in order:
            if len(sel) >= n_bits:
                break
            if ci in sel:
                continue
            v = Bn[:, ci]
            if sel_vecs and np.max(np.abs(np.stack(sel_vecs) @ v)) > thr:
                continue
            sel.append(ci)
            sel_vecs.append(v)
        thr += 0.05
    sel = np.asarray(sel[:n_bits])
    return cand[sel].astype(np.int32), mean[sel], thr


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "kbslam", "frontend",
        "brief_pattern_learned.npy")
    patches = collect_patches()
    pat, means, thr = learn(patches)
    print(f"selected {len(pat)} pairs, bit means [{means.min():.2f}, "
          f"{means.max():.2f}], final corr threshold {thr:.2f}")
    np.save(out, pat)
    print("wrote", out)


if __name__ == "__main__":
    main()
