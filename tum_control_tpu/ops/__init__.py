from tum_control_tpu.ops.soft_qp import solve_soft_qp, CondensedQP
from tum_control_tpu.ops.ipm import solve_soft_qp_ipm, IPMStats, IPMWarm
from tum_control_tpu.ops.rti import RTIEngine, RTIState, OCPFunctions, SolverStats, QPMods
