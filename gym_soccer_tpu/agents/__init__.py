from . import evaluation, learners, planners  # noqa: F401
