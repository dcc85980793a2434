from tum_control_tpu.learn.policy import MLPPolicy, load_sb3_policy
from tum_control_tpu.learn.observation import ObservationConfig, make_observation
from tum_control_tpu.learn.wmpc import WMPCController
