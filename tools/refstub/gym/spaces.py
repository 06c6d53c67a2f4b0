"""Minimal gym.spaces stub: only what the reference constructor touches."""


class Discrete:
    def __init__(self, n):
        self.n = int(n)

    def __repr__(self):
        return f"Discrete({self.n})"


class Dict:
    def __init__(self, spaces_dict):
        self.spaces = dict(spaces_dict)

    def __getitem__(self, key):
        return self.spaces[key]

    def __contains__(self, key):
        return key in self.spaces

    def __repr__(self):
        return f"Dict({self.spaces})"
