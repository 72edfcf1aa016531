cd /root/repo
python train.py train --steps 20000 --episodes 4 --batch-size 4 \
  --lr 1e-3 --critic-lr 1e-4 -H 196 --gamma 0.99 --entropy 0.02 \
  --points 0.10 --mono 1.0 --critic 0.2 --rtg-beta 0.99 \
  --warmup-steps 10 --upsample-ratio 0.25 -t mlp \
  --print-freq 1000000 --eval-freq 2000 --eval-games 100 \
  --checkpoint-dir /tmp/ckpt_full --log-dir /tmp/logs_full --scan-cap 2048 \
  --checkpoint-freq 5000
