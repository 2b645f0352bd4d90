"""Test-side alias of evennicer_slam_tpu.utils.refbridge: shims that make the
ACTUAL reference code at /root/reference importable and runnable on CPU. See
that module's docstring for what is shimmed and why. The canonical copy lives
in the package so offline tools (tools/compare_reference.py) can use it too.
"""

from evennicer_slam_tpu.utils.refbridge import (  # noqa: F401
    REFERENCE_ROOT,
    install,
    reference_available,
)
