"""Host-side quad-group mask statistics at the CURRENT kernel config.

Round-3 measured mask dilution at quantum=32 (G=4 pieces/chunk); hardware
now forces quantum=128, where runrows=128 means G=1 (no co-chunking OR at
all) and runrows=256 means G=2. This probe runs phase 1 on the bench scene
(CPU backend fine — phase 1 is XLA) and prints, per config:

  * pieces/frame and chunks/frame,
  * mean active quad groups per CHUNK (the kernel's actual skip unit),
  * the implied compute fraction vs all-groups-on.

Decides whether mask-aware piece packing / per-group chunk lists still have
headroom at q=128 (STATUS.md round-4 decision gate).
"""

import os
import time

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
# The axon sitecustomize imports jax at interpreter startup, so env vars are
# too late; PLENOCTREE_PLATFORM goes through jax.config (package __init__).
os.environ["PLENOCTREE_PLATFORM"] = os.environ.get("PROBE_PLATFORM", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

from bench_octree_render import make_tree, orbit_pose  # noqa: E402
from sweep_tile_knobs import load_index  # noqa: E402

TREE_CACHE = "/tmp/bench_tree_d8.npz"


def main():
    import jax
    import jax.numpy as jnp

    from plenoctree_tpu.octree.n3tree import N3Tree
    from plenoctree_tpu.octree.tile_render import TileRenderer

    reso = int(os.environ.get("PM_RESO", 800))
    fx = reso * 1.1
    t0 = time.time()
    tree = N3Tree.load(TREE_CACHE) if os.path.exists(TREE_CACHE) else make_tree(8)
    index = load_index()
    assert index is not None
    print(f"setup {time.time()-t0:.0f}s")

    for runrows in (128, 256):
        rend = TileRenderer(
            tree, sigma_thresh=1e-2, stop_thresh=1e-2, grid_c=64,
            output="u8", tile=16, runrows=runrows, quantum=128, nbuf=4,
            index=index,
        )
        if rend.w1cap is None:
            # Same sizing as the render path's lazy init (tile_render.py).
            rend.w1cap = int(
                min(
                    rend.grid_c,
                    np.ceil(np.sqrt(3) * rend.tile / fx * rend.grid_c) + 3,
                )
            )
        ti = rend.make_tile_inputs_fn(reso, reso, fx, rend.rcap, rend.w1cap)
        ti_j = jax.jit(ti)
        G = runrows // 128
        stats = []
        for ang in (0.123, 0.9, 2.2):
            p2_args, _, _, _ = ti_j(
                jnp.asarray(orbit_pose(ang).astype(np.float32)),
                index["csr"], index["base"], rend.extra_data,
                index["blk_bbox"],
            )
            meta = np.asarray(p2_args[0])[:, 0, :]  # [tiles, 4]
            n_pieces = meta[:, 0]
            masks = np.asarray(p2_args[4])[:, 0, :]  # [tiles, ccap]
            total_p = int(n_pieces.sum())
            # Chunk ORs: group G consecutive pieces per chunk.
            act_bits = 0
            n_chunks = 0
            for t in range(masks.shape[0]):
                np_t = int(n_pieces[t])
                if np_t == 0:
                    continue
                m = masks[t, :np_t]
                pad = (-np_t) % G
                if pad:
                    m = np.concatenate([m, np.zeros(pad, m.dtype)])
                m = m.reshape(-1, G)
                chunk_or = np.bitwise_or.reduce(m, axis=1)
                bits = np.unpackbits(
                    chunk_or.astype(np.uint8)[:, None], axis=1, count=8
                )[:, -4:]
                act_bits += int(bits.sum())
                n_chunks += chunk_or.shape[0]
            piece_bits_mean = 0.0
            all_masks = np.concatenate(
                [masks[t, : int(n_pieces[t])] for t in range(masks.shape[0])]
            )
            pb = np.unpackbits(
                all_masks.astype(np.uint8)[:, None], axis=1, count=8
            )[:, -4:]
            piece_bits_mean = float(pb.sum(1).mean())
            stats.append((total_p, n_chunks, act_bits / max(n_chunks, 1),
                          piece_bits_mean))
            print(
                f"  r{runrows} pose{ang}: pieces={total_p} chunks={n_chunks} "
                f"mean active groups/chunk={act_bits / max(n_chunks,1):.2f} "
                f"(fraction {act_bits / max(n_chunks,1) / 4:.2f}), "
                f"mean piece bits={piece_bits_mean:.2f}"
            )
        mg = np.mean([s[2] for s in stats])
        print(
            f"RESULT r{runrows} q128 G={G}: mean active groups/chunk "
            f"{mg:.2f} -> compute fraction {mg/4:.2f}; "
            f"chunks/frame ~{int(np.mean([s[1] for s in stats]))}"
        )


if __name__ == "__main__":
    main()
