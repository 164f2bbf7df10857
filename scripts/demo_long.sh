#!/bin/bash
# Quality-grade demo (round 3c): full 30k R-D run from scratch on the
# device-resident corpus, then the GAN phase, then compress the 7
# full-res CLIC originals with both.
set -e
cd /root/repo
python scripts/make_demo_crops.py   # self-heal: resets wipe /root/demo_crops
COMMON="-mt compression -regime low -d /root/demo_crops -bs 8 --dtype bfloat16 \
  --latent_channels 120 --n_residual_blocks 4 --hyperlatent_filters 192 \
  --uncalibrated_lpips_ok --device_data --log_interval 500 --save_interval 5000"
python -m hific_tpu.cli.train $COMMON -steps 30000 -name demo3_long
python -m hific_tpu.cli.train -mt compression_gan -regime low -d /root/demo_crops \
  -bs 8 --dtype bfloat16 --latent_channels 120 --n_residual_blocks 4 \
  --hyperlatent_filters 192 --uncalibrated_lpips_ok --device_data --log_interval 500 \
  --save_interval 3000 -steps 36000 -name demo3_long_gan \
  --warmstart_ckpt experiments/demo3_long_compression_low/checkpoints/step_30000
python -m hific_tpu.cli.compress -ckpt experiments/demo3_long_compression_low/checkpoints \
  -i /root/reference/assets/originals -o demo_out3_long --save --shape_bucket 512 --pipeline 7
python -m hific_tpu.cli.compress -ckpt experiments/demo3_long_gan_compression_gan_low/checkpoints \
  -i /root/reference/assets/originals -o demo_out3_long_gan --save --shape_bucket 512 --pipeline 7
echo DEMO_LONG_DONE
