"""Real multi-process (DCN) distributed init — end-to-end evidence.

The reference forms an actual process group at runtime
(model/lavis/common/dist_utils.py:57-91 init_distributed_mode: env://
rendezvous, init_process_group, barrier). Our analog is
``core.mesh.init_distributed`` + a global process-spanning Mesh; the
mocked-env unit coverage lives in test_core.py, and THIS test runs the
real mechanism: two fresh interpreters, each with 4 virtual CPU devices,
rendezvous over a localhost coordinator, form the 8-device global mesh,
and run one data-parallel LoRA step where each process loads only its
``host_local_batch_slice``. Loss must be identical across ranks AND equal
to the single-process value on an equally sized mesh.

Marked slow: spawns 3 subprocesses x (backend init + one tiny jit), ~60s.
"""
import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


@pytest.mark.slow
def test_two_process_dcn_dryrun():
    import __graft_entry__ as g
    g.dryrun_multihost(num_processes=2, devices_per_process=4)
