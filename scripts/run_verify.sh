#!/bin/bash
# End-to-end verify: synth data -> train -> eval -> extract -> optimize -> evaluate.
# Captures PSNR evidence for docs/STATUS.md (VERDICT round-2 task #5).
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
MODEL_FLAGS="--num_coarse_samples 16 --num_fine_samples 16 --net_depth 3 --net_width 48 --sh_deg 1 --nouse_viewdirs --factor 0"

python -c "from plenoctree_tpu.data.synthetic import write_blender_dataset; \
  write_blender_dataset('/tmp/synth_scene', n_train=12, n_test=3, resolution=48)" || exit 1

timeout 900 python -m nerf_sh.train --dataset blender --data_dir /tmp/synth_scene \
  --train_dir /tmp/vtrain --batch_size 256 --image_batching \
  --max_steps 300 --print_every 50 --save_every 300 --render_every 300 \
  --lr_init 2e-3 --chunk 2048 --sparsity_npoints 256 $MODEL_FLAGS || exit 1

timeout 600 python -m nerf_sh.eval --dataset blender --data_dir /tmp/synth_scene \
  --train_dir /tmp/vtrain --batch_size 256 --chunk 4096 $MODEL_FLAGS || exit 1

timeout 900 python -m octree.extraction --dataset blender --data_dir /tmp/synth_scene \
  --train_dir /tmp/vtrain $MODEL_FLAGS \
  --init_grid_depth 6 --samples_per_cell 8 --renderer_step_size 1e-3 \
  --output /tmp/vtrain/tree.npz || exit 1

timeout 900 python -m octree.optimization --input /tmp/vtrain/tree.npz \
  --dataset blender --data_dir /tmp/synth_scene --num_epochs 10 \
  --renderer_step_size 1e-3 --output /tmp/vtrain/tree_opt.npz || exit 1

timeout 600 python -m octree.evaluation --input /tmp/vtrain/tree_opt.npz \
  --dataset blender --data_dir /tmp/synth_scene --renderer_step_size 1e-3 || exit 1
echo "VERIFY_ALL_OK"
