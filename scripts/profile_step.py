import time
import numpy as np
import jax, jax.numpy as jnp
from tpu2048.train.loop import TrainConfig, build_model, make_process_fn
from tpu2048.algo import rollout as R, update as U, advantage as A
from tpu2048.ops import OptimizerConfig, optimizer as opt
from tpu2048.train import checkpoint as CKPT

cfg = TrainConfig(steps=30000, num_episodes=256, batch_size=4096, scan_cap=2048,
                  hidden_size=196, num_layers=2, points_weight=0.10,
                  monotonicity_weight=1.0, critic_strength=0.2, rtg_beta=0.99,
                  warmup_steps=10, upsample_ratio=0.25, kl_diagnostic=False)
model_cfg, init_fn, apply_eval, apply_train, labels_fn = build_model(cfg)
params = init_fn(jax.random.key(0))
labels = labels_fn(params)
tree = dict(params=params, opt_state=opt.init(params, labels),
            moments=A.RtgMoments.initial(), key=jax.random.key_data(jax.random.key(0)))
tree, man = CKPT.load_checkpoint("checkpoints_ht", "train_state", tree)
params, opt_state, moments = tree["params"], tree["opt_state"], tree["moments"]

opt_cfg = OptimizerConfig(learning_rate=1e-3, critic_lr=1e-4)
optimize_fn = U.make_optimize_fn(apply_train, labels, opt_cfg, cfg.batch_size,
                                 cfg.ppo_epochs, kl_diagnostic=False)
process_fn = make_process_fn(cfg, apply_train, labels, optimize_fn)
rollout_fn = jax.jit(lambda p, k: R.rollout(apply_eval, p, k, 256, 2048))

key = jax.random.key(99)
# warm up compiles
traj = rollout_fn(params, jax.random.key(1)); jax.block_until_ready(traj.total_points)
out = process_fn(params, opt_state, traj, moments, jax.random.key(2), jnp.int32(5000), jnp.float32(0.02))
jax.block_until_ready(out[3]["scalars"])
for i in range(3):
    t0=time.perf_counter()
    traj = rollout_fn(params, jax.random.key(10+i)); jax.block_until_ready(traj.total_points)
    t1=time.perf_counter()
    p2,o2,m2,outs = process_fn(params, opt_state, traj, moments, jax.random.key(20+i), jnp.int32(5000), jnp.float32(0.02))
    jax.block_until_ready(outs["scalars"])
    t2=time.perf_counter()
    sc = np.asarray(outs["scalars"])
    t3=time.perf_counter()
    env = int(np.asarray(traj.num_moves).sum()); trips=int(traj.steps_executed)
    print(f"run{i}: rollout {t1-t0:.3f}s ({env} moves, {trips} trips) process {t2-t1:.3f}s fetch {t3-t2:.4f}s -> {env/(t2-t0):,.0f} env-steps/s")
