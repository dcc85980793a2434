from tum_control_tpu.sim.closed_loop import ClosedLoopSim, SimLog
from tum_control_tpu.sim.estimator import EstimatorState, WINDOW_SIZES, estimate, init_estimator
from tum_control_tpu.sim.disturbances import DisturbanceConfig, draw_disturbance
