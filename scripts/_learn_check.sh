cd /root/repo
python train.py train --steps 1500 --episodes 4 --batch-size 4 \
  --lr 1e-3 --critic-lr 1e-4 -H 196 --gamma 0.99 --entropy 0.02 \
  --points 0.10 --mono 1.0 --critic 0.2 --rtg-beta 0.99 \
  --warmup-steps 10 --upsample-ratio 0.25 -t mlp \
  --print-freq 500 --eval-freq 500 --eval-games 50 \
  --checkpoint-dir /tmp/ckpt_learn --log-dir /tmp/logs_learn --scan-cap 2048 \
  2>&1 | grep -v WARNING | tail -30
