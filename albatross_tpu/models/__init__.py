from .base import FitModel, ModelBase, Prediction
from .gp import (
    GaussianProcess,
    GPFit,
    gp_from_covariance,
    gp_from_covariance_and_mean,
    gp_joint_prediction,
    gp_marginal_prediction,
    gp_mean_prediction,
    negative_log_likelihood,
)

__all__ = [k for k in dir() if not k.startswith("_")]
