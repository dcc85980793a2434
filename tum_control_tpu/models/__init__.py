from tum_control_tpu.models.vehicle_stm import (
    pred_ode,
    sim_ode,
    sim_ode_disturbed,
    lateral_forces,
)
from tum_control_tpu.models.integrators import rk4_step, rk4_multistep
