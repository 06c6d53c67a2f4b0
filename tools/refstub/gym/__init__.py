# Minimal stub of the `gym` API surface used by the reference repo
# (/root/reference), just enough to execute it for golden-fixture
# generation.  This is test tooling only; the real framework
# (gym_soccer_tpu) has its own spaces module and no gym dependency.
from . import spaces  # noqa: F401
