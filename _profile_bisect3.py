import time
import numpy as np
import jax, jax.numpy as jnp
from dataclasses import replace
from tpu2048.train.loop import TrainConfig, build_model, make_process_fn
from tpu2048.algo import rollout as R, update as U, advantage as A
from tpu2048.ops import OptimizerConfig, optimizer as opt
from tpu2048.train import checkpoint as CKPT

base = TrainConfig(steps=30000, num_episodes=256, batch_size=4096, scan_cap=2048,
                  hidden_size=196, num_layers=2, points_weight=0.10,
                  monotonicity_weight=1.0, critic_strength=0.2, rtg_beta=0.99,
                  warmup_steps=10, upsample_ratio=0.25, kl_diagnostic=False)
model_cfg, init_fn, apply_eval, apply_train, labels_fn = build_model(base)
params = init_fn(jax.random.key(0))
labels = labels_fn(params)
tree = dict(params=params, opt_state=opt.init(params, labels),
            moments=A.RtgMoments.initial(), key=jax.random.key_data(jax.random.key(0)))
tree, man = CKPT.load_checkpoint("checkpoints_ht", "train_state", tree)
params, opt_state, moments = tree["params"], tree["opt_state"], tree["moments"]
opt_cfg = OptimizerConfig(learning_rate=1e-3, critic_lr=1e-4)

rollout_fn = jax.jit(lambda p, k: R.rollout(apply_eval, p, k, 256, 2048))
traj = rollout_fn(params, jax.random.key(1))
_ = np.asarray(traj.total_points)  # hard barrier

def timed(fn, fetch, n=3):
    fetch(fn(jax.random.key(0)))
    best = 1e9
    for i in range(n):
        t0 = time.perf_counter()
        fetch(fn(jax.random.key(10 + i)))
        best = min(best, time.perf_counter() - t0)
    return best

# rollout alone
t = timed(lambda k: rollout_fn(params, k), lambda o: np.asarray(o.total_points))
print(f"rollout alone:           {t:.3f}s")

variants = (("full ups=.25 drop=.1", 0.25, 0.1, 1),
            ("ups=0", 0.0, 0.1, 1),
            ("dropout=0", 0.25, 0.0, 1),
            ("epochs... bs=1024", 0.25, 0.1, 1024),
            )
for tag, ups, dropout, bs in variants:
    bs = base.batch_size if bs == 1 else bs
    cfg = replace(base, upsample_ratio=ups, dropout=dropout, batch_size=bs)
    mc2, _, ae2, at2, _ = build_model(cfg)
    optimize_fn = U.make_optimize_fn(at2, labels, opt_cfg, cfg.batch_size, 1, kl_diagnostic=False)
    pf = make_process_fn(cfg, at2, labels, optimize_fn)
    def run(k):
        return pf(params, opt_state, traj, moments, k, jnp.int32(5000), jnp.float32(0.02))
    t = timed(run, lambda o: np.asarray(o[3]["scalars"]))
    print(f"process {tag:22s}: {t:.3f}s")
