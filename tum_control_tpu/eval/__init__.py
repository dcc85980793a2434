from tum_control_tpu.eval.logger import assemble_logs, evaluation, save_logs
