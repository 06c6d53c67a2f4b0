from gym_soccer_tpu.envs import SoccerSimultaneousEnv  # noqa: F401
