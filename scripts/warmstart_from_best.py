"""Build a full train_state checkpoint from a params-only best_model
checkpoint: fresh optimizer state, RTG moments measured from a rollout with
the loaded policy (so normalization resumes calibrated), manifest pinned at
the recorded train_step. Used to warm-start round 2 from round 1's best
model (round 1's train_state was never committed — only best_model params)."""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tpu2048.algo import advantage as A
from tpu2048.algo import rollout as R
from tpu2048.models import mlp
from tpu2048.ops import optimizer as opt
from tpu2048.train import checkpoint as CKPT
from tpu2048.train.evaluate import load_model_checkpoint


def main(ckpt_dir="checkpoints_ht", train_step=4500, gamma=0.99,
         points_w=0.10, mono_w=1.0, src_dir=None, highest_score=0,
         expert_depth=0):
    """Keep train_step high enough that the RTG bias correction
    (1 - rtg_beta^step) is ~1.0 for the stored unbiased moments.

    ``expert_depth > 0``: measure the moments under EXPERT (expectimax)
    play instead of the sampled policy — the right calibration when the
    checkpoint seeds an expert-iteration run, whose returns are the
    expert's, not the policy's."""
    params, mc, mt = load_model_checkpoint(src_dir or ckpt_dir)
    import json
    manifest_best = json.load(open(Path(src_dir or ckpt_dir) / "best_model.json"))
    labels = mlp.param_labels(params)
    opt_state = opt.init(params, labels)

    # Measure raw return moments under the current policy (or expert).
    apply_eval = lambda p, x: mlp.apply(p, mc, x)
    if expert_depth:
        from tpu2048.train.evaluate import load_search_coefs

        coefs = load_search_coefs(src_dir or ckpt_dir)
        print(f"measuring moments under depth-{expert_depth} expert play "
              f"({coefs})")
        n_games = 32 if expert_depth >= 2 else 128
        traj = jax.jit(lambda p, k: R.rollout(
            apply_eval, p, k, n_games, 2560, expert_depth=expert_depth,
            expert_coefs=coefs))(params, jax.random.key(123))
    else:
        traj = jax.jit(lambda p, k: R.rollout(apply_eval, p, k, 128, 2048))(
            params, jax.random.key(123))
    w = A.RewardWeights(points=points_w, monotonicity=mono_w)
    r = A.step_rewards(traj.points, traj.mono_before, traj.mono_after,
                       traj.empt_before, traj.empt_after, w, gamma)
    r = jnp.where(traj.valid, r, 0.0)
    G = np.asarray(A.returns_to_go(r, traj.valid, gamma))
    m = np.asarray(traj.valid, np.float64)
    mu = float((G * m).sum() / m.sum())
    m2 = float((G * G * m).sum() / m.sum())
    print(f"measured RTG moments: mu={mu:.3f} E[G^2]={m2:.3f} "
          f"(std={np.sqrt(m2 - mu * mu):.3f}) over {int(m.sum())} steps")
    # Stored moments are consumed as moments/bias_correction with
    # bias_correction = 1 - 0.99^4500 ~= 1.0, so store the unbiased values.
    moments = A.RtgMoments(jnp.float64(mu).astype(jnp.float32),
                           jnp.float64(m2).astype(jnp.float32),
                           jnp.float64(mu).astype(jnp.float32))

    key = jax.random.key(20260818)
    CKPT.save_checkpoint(
        ckpt_dir, "train_state",
        arrays_tree=dict(params=params, opt_state=opt_state, moments=moments,
                         key=jax.random.key_data(key)),
        manifest=dict(
            train_step=train_step,
            highest_score=int(highest_score),
            best_eval_avg=float(manifest_best.get("eval_avg_score", 0.0)),
            emas=dict(avg_score=5000.0, pct_512=50.0, pct_1024=10.0,
                      pct_2048=0.0, explained_var=0.3),
            current_beta=0.02,
            config={}, model_config=mc.to_dict(),
            warmstart=f"params from {src_dir or ckpt_dir}/best_model "
                      f"(eval avg {manifest_best.get('eval_avg_score')}); "
                      "fresh optimizer; moments measured from a rollout",
        ),
    )
    print(f"train_state written to {ckpt_dir} at step {train_step}")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", default="checkpoints_ht")
    ap.add_argument("--src-dir", default=None,
                    help="where to read best_model from (default: ckpt-dir)")
    ap.add_argument("--train-step", type=int, default=4500)
    ap.add_argument("--gamma", type=float, default=0.99)
    ap.add_argument("--points", type=float, default=0.10)
    ap.add_argument("--mono", type=float, default=1.0)
    ap.add_argument("--highest-score", type=int, default=0)
    ap.add_argument("--expert-depth", type=int, default=0,
                    help="Measure moments under expert (expectimax) play")
    a = ap.parse_args()
    main(a.ckpt_dir, a.train_step, a.gamma, a.points, a.mono, a.src_dir,
         a.highest_score, a.expert_depth)
