"""Median-cut palette quantization for octree compression.

Replaces svox `_C.quantize_median_cut` (octree/compression.py:34,60,114,
SURVEY.md §2.1) with a fully vectorized numpy k-d median cut: all boxes
split simultaneously per level (each along its own longest axis, at its
weighted median), `bits` levels -> up to 2^bits palette entries. One lexsort
per level, no per-box python loops.
"""

import numpy as np


def quantize_median_cut(colors, weights=None, bits=16):
    """Quantize [M, C] colors to a <=2^bits palette.

    Args:
      colors: [M, C] float colors (C typically 3).
      weights: optional [M] nonnegative weights (weighted means/medians).
      bits: number of split levels (palette size <= 2^bits).

    Returns:
      palette: [P, C] float32 palette colors.
      color_id_map: [M] uint32 palette index per input color.
    """
    colors = np.asarray(colors, np.float32)
    m = colors.shape[0]
    if m == 0:
        return np.zeros((0, colors.shape[1]), np.float32), np.zeros((0,), np.uint32)
    try:
        from plenoctree_tpu.native import median_cut_native

        native = median_cut_native(colors, weights, bits)
    except Exception:
        native = None
    if native is not None:
        return native
    if weights is None or len(weights) == 0:
        weights = np.ones(m, np.float32)
    weights = np.asarray(weights, np.float32)

    box = np.zeros(m, np.int64)  # box id per point
    # Don't split further than the number of points allows.
    levels = min(bits, max(int(np.ceil(np.log2(max(m, 2)))), 1))
    for _ in range(levels):
        # Longest axis per box: segment min/max over points.
        n_boxes = int(box.max()) + 1
        mins = np.full((n_boxes, colors.shape[1]), np.inf, np.float32)
        maxs = np.full((n_boxes, colors.shape[1]), -np.inf, np.float32)
        np.minimum.at(mins, box, colors)
        np.maximum.at(maxs, box, colors)
        axis = np.argmax(maxs - mins, axis=1)  # [n_boxes]
        key = colors[np.arange(m), axis[box]]
        order = np.lexsort((key, box))
        # Rank of each point within its box.
        sorted_box = box[order]
        box_start = np.r_[0, np.nonzero(np.diff(sorted_box))[0] + 1]
        starts_per_point = np.repeat(box_start, np.diff(np.r_[box_start, m]))
        rank = np.arange(m) - starts_per_point
        counts = np.diff(np.r_[box_start, m])
        counts_per_point = np.repeat(counts, counts)
        upper = rank >= (counts_per_point + 1) // 2
        new_box = np.empty(m, np.int64)
        new_box[order] = sorted_box * 2 + upper
        box = new_box

    # Dense palette ids + weighted mean colors.
    uniq, dense = np.unique(box, return_inverse=True)
    p = uniq.size
    wsum = np.zeros(p, np.float64)
    csum = np.zeros((p, colors.shape[1]), np.float64)
    np.add.at(wsum, dense, weights)
    np.add.at(csum, dense, colors * weights[:, None])
    palette = (csum / np.maximum(wsum, 1e-12)[:, None]).astype(np.float32)
    return palette, dense.astype(np.uint32)


def compress_tree_npz(
    input_path,
    output_path,
    bits=16,
    sigma_thresh=2.0,
    retain=0,
    weighted=False,
    noquant=False,
):
    """Compress a tree.npz for web serving.

    Parity: octree/compression.py:39-141 — drop bookkeeping arrays, zero
    voxels below sigma_thresh, per-SH-channel median-cut palette (uint16 map
    + fp16 palette), optional first-k coeff retention, deflate.
    """
    z = dict(np.load(input_path, allow_pickle=False))
    if not noquant and "quant_colors" in z:
        return False  # already compressed
    for key in ("parent_depth", "geom_resize_fact", "n_free", "n_internal", "depth_limit"):
        z.pop(key, None)

    if not noquant:
        data = np.asarray(z["data"], np.float32)
        n = data.shape[1]
        sigma = data[..., -1].reshape(-1).copy()
        snz = sigma > sigma_thresh
        sigma[~snz] = 0.0

        rgb = data[..., :-1]
        basis_dim = rgb.shape[-1] // 3
        rgb = rgb.reshape(-1, 3, basis_dim)[snz]

        if weighted:
            weights = 1.0 - np.exp(-0.01 * sigma[snz])
        else:
            weights = None

        quant_colors, quant_maps, retained = [], [], []
        for i in range(basis_dim):
            d = np.ascontiguousarray(rgb[:, :, i])
            if i < retain:
                full = np.zeros((snz.shape[0], 3), np.float16)
                full[snz] = d.astype(np.float16)
                retained.append(full.reshape(-1, n, n, n, 3))
                continue
            palette, ids = quantize_median_cut(d, weights, bits)
            full = np.zeros((snz.shape[0],), np.uint16)
            full[snz] = ids.astype(np.uint16)
            quant_colors.append(palette.astype(np.float16))
            quant_maps.append(full.reshape(-1, n, n, n))
        # Palettes can differ in size; pad to the max for a rectangular stack.
        pmax = max(c.shape[0] for c in quant_colors)
        quant_colors = [
            np.pad(c, ((0, pmax - c.shape[0]), (0, 0))) for c in quant_colors
        ]
        z["quant_colors"] = np.stack(quant_colors, axis=0)
        z["quant_map"] = np.stack(quant_maps, axis=0)
        z["sigma"] = sigma.reshape(-1, n, n, n)
        if retain:
            z["data_retained"] = np.stack(retained, axis=0)
        del z["data"]
    np.savez_compressed(output_path, **z)
    return True
