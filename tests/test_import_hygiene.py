"""Importing the package must not touch any device.

A module-scope ``jnp.float32(...)`` (or any other jnp scalar/array
construction) is a device-array construction, which initializes the
default PJRT backend at IMPORT time.  On this project's deployment
target that backend can be a remote TPU relay, and relay outages then
hang every entry point — including ``--device cpu`` invocations whose
platform override runs after import.  The rule: imports build Python
objects only; the first array op after the CLI's platform selection is
what initializes a backend.  (Found live: an outage turned
``import stereomatch_tpu`` into an indefinite hang via
``ops/disparity.py``'s module-scope ``_INF``.)
"""

import json
import subprocess
import sys


def test_package_import_initializes_no_backend():
    code = (
        "import stereomatch_tpu\n"
        "import stereomatch_tpu.parallel\n"
        "import stereomatch_tpu.stream\n"
        "import stereomatch_tpu.tune\n"
        "import stereomatch_tpu.cli.image, stereomatch_tpu.cli.video\n"
        "import stereomatch_tpu.cli.serve, stereomatch_tpu.cli.evaluate\n"
        "import jax._src.xla_bridge as xb\n"
        "import json\n"
        "print(json.dumps(sorted(xb._backends)))\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    initialized = json.loads(out.stdout.strip().splitlines()[-1])
    assert initialized == [], (
        f"importing stereomatch_tpu initialized backends {initialized}; "
        "some module-scope code constructs device values (see module "
        "docstring)")


def test_backend_stall_watchdog_fires_and_stays_quiet():
    """The CLI watchdog prints its hint only while no backend has
    initialized (the remote-relay discovery hang); after a successful
    init it stays silent."""
    code = (
        "import time, jax\n"
        "from stereomatch_tpu.utils.backend import "
        "warn_if_backend_init_stalls\n"
        "warn_if_backend_init_stalls(0.2)   # no backend yet -> fires\n"
        "time.sleep(0.6)\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.devices()                      # init completes\n"
        "warn_if_backend_init_stalls(0.2)   # table populated -> silent\n"
        "time.sleep(0.6)\n"
        "print('END')\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert out.stderr.count("still initializing") == 1, out.stderr
    assert "END" in out.stdout


def test_backend_stall_watchdog_skips_forced_cpu():
    """With the host backend force-selected (what every in-process CLI
    test does), the watchdog must not arm at all — its late daemon-timer
    fire was polluting captured test output (round 4)."""
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from stereomatch_tpu.utils.backend import "
        "warn_if_backend_init_stalls\n"
        "print('timer:', warn_if_backend_init_stalls(0.1))\n"
        "import time; time.sleep(0.4)\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "timer: None" in out.stdout
    assert "still initializing" not in out.stderr
