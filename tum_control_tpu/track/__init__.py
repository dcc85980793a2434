from tum_control_tpu.track.trajectory import RefTrajectory, Track, load_ref_trajectory, load_track
from tum_control_tpu.track.planner import planner_emulator, RefWindow
