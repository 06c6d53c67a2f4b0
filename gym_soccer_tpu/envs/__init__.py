from .soccer_simultaneous_env import SoccerSimultaneousEnv  # noqa: F401
