"""Motion-imitation learning harness.

Capability parity with the reference's imitation stack (reference:
motion_imitation/learning/{ppo_imitation,imitation_policies,
imitation_runners}.py, utilities/motion_data.py, and
envs/env_wrappers/imitation_task.py): clip-tracking reward on the
quadruped sim plus a PPO trainer. Re-designed for this framework: the
trainer is JAX (jit on TPU/CPU) on the functional nn module system
instead of the reference's TF1 stable-baselines PPO1, and motion clips
can be synthesized procedurally instead of shipping mocap data.
"""

from .motion_clip import MotionClip, synthesize_gait
from .task import ImitationA1
from .ppo import PPOImitation
