"""Prune-bias check (VERDICT r4 item 4): how often does top-k pruning of the
inner max nodes change the chosen move, and by how much does it move the
root scores?

Inner max nodes only exist at depth >= 3 (algo/search.py:state_values —
at depth 2 the recursive calls run at depth 1, below the pruning gate), so
the meaningful comparison is at depth 3: ``expectimax_scores(depth=3,
prune=0)`` (exact inner max, ~(4*32)^2*32 critic leaves per board) against
``expectimax_scores(depth=3, prune_k=k)`` — the exact configuration the
depth-3 eval rows in BENCH.md were produced with.

Samples boards from real games played by the checkpoint's own greedy policy
(so the distribution matches eval play).

Usage: python scripts/prune_bias.py [ckpt] [n_boards] [depth]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "checkpoints_expA"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from tpu2048.algo import rollout as R
    from tpu2048.algo import search as SRCH
    from tpu2048.env import engine
    from tpu2048.models import mlp, urm
    from tpu2048.train.evaluate import load_model_checkpoint, load_search_coefs

    params, mc, mt = load_model_checkpoint(ckpt)
    coefs = load_search_coefs(ckpt)
    mod = urm if mt == "urm" else mlp
    apply_fn = lambda p, x: mod.apply(p, mc, x)

    # Boards from the policy's own greedy games: play 64 games, sample states
    # uniformly over recorded steps.
    traj = jax.jit(lambda p, k: R.rollout(apply_fn, p, k, 64, 512,
                                          env_key=jax.random.key(99),
                                          greedy=True))(params,
                                                        jax.random.key(1))
    valid = np.asarray(traj.valid).reshape(-1)
    boards = np.asarray(traj.board_before).reshape(-1, 4, 4)[valid]
    rng = np.random.default_rng(0)
    pick = rng.choice(len(boards), size=min(n, len(boards)), replace=False)
    sample = jnp.asarray(boards[pick], jnp.int32)
    moves = engine.all_moves(sample)
    legal = ~np.asarray(moves.action_mask)  # (n, 4)

    @jax.jit
    def exact(p, b, m):
        return SRCH.expectimax_scores(apply_fn, p, b, m, coefs, depth, 0)

    exact_scores = np.asarray(exact(params, sample, moves))

    print(f"boards sampled: {len(pick)} (from greedy games, ckpt {ckpt}), "
          f"depth={depth}: exact (prune 0) vs pruned inner max")
    for k in (2, 3):
        pruned = jax.jit(
            lambda p, b, m, kk=k: SRCH.expectimax_scores(
                apply_fn, p, b, m, coefs, depth, kk))
        ps = np.asarray(pruned(params, sample, moves))
        # argmax over legal moves only
        ex = np.where(legal, exact_scores, -np.inf)
        pr = np.where(legal, ps, -np.inf)
        agree = (ex.argmax(-1) == pr.argmax(-1)).mean()
        finite = np.isfinite(ex) & np.isfinite(pr)
        dev = np.abs(ex[finite] - pr[finite])  # -inf illegal slots excluded
        sigma = coefs.sigma
        print(f"prune_k={k}: argmax agreement {agree * 100:.2f}%  "
              f"|score dev| mean {dev.mean():.4f} (={dev.mean() / sigma:.4f} "
              f"sigma), p95 {np.percentile(dev, 95):.4f}, "
              f"max {dev.max():.4f}")


if __name__ == "__main__":
    main()
