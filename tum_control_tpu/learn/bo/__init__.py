from tum_control_tpu.learn.bo.segmentation import get_train_segments, curvature_segmentation
from tum_control_tpu.learn.bo.gp import GPParams, fit_gp, gp_posterior
from tum_control_tpu.learn.bo.optimizer import BayesianOptimizer, BOConfig
