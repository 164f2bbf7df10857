#!/bin/bash
# Round 4: quality run on the FLAGSHIP architecture (C=220, 9 res blocks,
# N=320 — the paper configuration; round-3 MFU table measured its train
# step at 161 img/s with remat, so this costs about the same wall clock
# as the small-model run). Same recipe as scripts/demo_long.sh for a
# clean capacity A/B: 30k R-D steps from scratch on the device-resident
# 840-crop corpus, 6k GAN steps warm-started, then full-res compression
# of the 7 CLIC originals with both checkpoints.
set -e
cd /root/repo
python scripts/make_demo_crops.py   # self-heal: resets wipe /root/demo_crops
COMMON="-regime low -d /root/demo_crops -bs 8 --dtype bfloat16 --use_remat \
  --uncalibrated_lpips_ok --device_data --log_interval 500 --save_interval 5000"
python -m hific_tpu.cli.train -mt compression $COMMON -steps 30000 -name demo4_flagship
python -m hific_tpu.cli.train -mt compression_gan $COMMON -steps 36000 \
  -name demo4_flagship_gan --save_interval 3000 \
  --warmstart_ckpt experiments/demo4_flagship_compression_low/checkpoints/step_30000
python -m hific_tpu.cli.compress -ckpt experiments/demo4_flagship_compression_low/checkpoints \
  -i /root/reference/assets/originals -o demo_out4_flagship --save --shape_bucket 512 --pipeline 7
python -m hific_tpu.cli.compress -ckpt experiments/demo4_flagship_gan_compression_gan_low/checkpoints \
  -i /root/reference/assets/originals -o demo_out4_flagship_gan --save --shape_bucket 512 --pipeline 7
echo DEMO_FLAGSHIP_DONE
