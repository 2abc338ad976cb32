"""vid2player3d_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
nv-tlabs/vid2player3d: hierarchical physically-simulated tennis players.

Layers (bottom → top), mirroring SURVEY.md §1 but unified into one package:

- ``core``     : quaternion/rotation math, SMPL body model, FK/IK, skeleton/motion types
- ``physics``  : jit-compiled batched reduced-coordinate rigid-body engine (replaces Isaac Gym)
- ``ops``      : Pallas TPU kernels for hot paths
- ``data``     : motion library, AMASS conversion, video pose datasets
- ``envs``     : functional vectorized environments (imitation, tennis, hierarchical controller)
- ``learn``    : PPO actor-learner, networks, normalizers, checkpoint surgery (replaces rl_games)
- ``models``   : MotionVAE (mixture-of-experts decoder)
- ``parallel`` : device-mesh sharding utilities (replaces horovod/NCCL)
- ``cli``      : training / evaluation entry points and config system
"""

__version__ = "0.1.0"
