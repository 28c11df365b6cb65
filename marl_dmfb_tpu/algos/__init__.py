"""Value-decomposition Q-learners (VDN / QMIX)."""

from marl_dmfb_tpu.algos.qlearn import LearnerState, make_learner

__all__ = ["LearnerState", "make_learner"]
