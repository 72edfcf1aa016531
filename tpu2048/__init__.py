"""tpu2048 — a TPU-native (JAX/XLA/Pallas/pjit) 2048 reinforcement-learning framework.

A from-scratch rebuild of the capabilities of the reference project
RobotSail/2048-PPO (PyTorch, host-looped) as a pure-functional, array-programming
framework: the environment, rollout, return/advantage computation and the PPO
learner are jitted XLA programs over ``(num_envs, 4, 4)`` board tensors with
explicit PRNG keys, sharded over device meshes via ``jax.sharding``.

Layout (mirrors SURVEY.md §7's build plan):
  env/       vectorized pure-functional game core + heuristics + symmetry
  models/    GameMLP / GameURM as pytree params + pure apply fns
  ops/       optimizers (Muon, AdamW), LR schedules, Pallas kernels
  algo/      fused rollout, reward/RTG/advantage math, PPO loss, update step
  parallel/  mesh construction, sharded train step, multi-host init
  train/     CLI, training loop, train state, checkpoint/resume, eval, export
  utils/     metric logger, batch stats, pretty printers, viz/ONNX exporters
  native/    C++ host-side engine (oracle/runtime) with ctypes bindings
"""

__version__ = "0.1.0"

GRID_SIZE = 4
NUM_ACTIONS = 4
NUM_CELLS = GRID_SIZE * GRID_SIZE

# Direction index convention — matches the reference model-output ordering
# (reference game.py:1087-1092): 0=UP, 1=DOWN, 2=LEFT, 3=RIGHT.
UP, DOWN, LEFT, RIGHT = 0, 1, 2, 3
DIRECTION_NAMES = ("UP", "DOWN", "LEFT", "RIGHT")
