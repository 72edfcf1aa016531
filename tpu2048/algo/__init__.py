"""Learning algorithm: fused rollout, advantage math, augmentation, PPO loss,
and the jitted minibatch update."""

from . import advantage, augment, losses, rollout, update  # noqa: F401
from .advantage import RewardWeights, RtgMoments  # noqa: F401
from .rollout import Trajectory  # noqa: F401
from .update import Dataset  # noqa: F401
