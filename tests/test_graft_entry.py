"""Driver-surface contract tests for __graft_entry__ (no real backend work).

The virtual-CPU re-exec must mark its child so the child skips the device
probe: some environments boot-register an accelerator backend over
JAX_PLATFORMS=cpu at interpreter startup, so a probing child would never
count its own virtual devices and would re-exec forever (regression:
observed as an unbounded chain of nested dryrun subprocesses)."""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge


class TestReexecEnvContract:
    def test_child_env_marks_vmesh_and_forces_cpu(self, monkeypatch):
        captured = {}

        def fake_run(cmd, env=None, cwd=None, **kw):
            captured["cmd"] = cmd
            captured["env"] = env

            class R:
                returncode = 0

            return R()

        monkeypatch.setattr(subprocess, "run", fake_run)
        ge._reexec_on_virtual_cpu_mesh(8)

        env = captured["env"]
        assert env["JAX_PLATFORMS"] == "cpu"
        assert env["CST_PLATFORM"] == "cpu"          # beats the boot shim
        assert env["_CST_DRYRUN_VMESH"] == "1"       # child skips the probe
        assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
        assert "dryrun_multichip(8)" in captured["cmd"][-1]

    def test_reexec_raises_on_child_failure(self, monkeypatch):
        def fake_run(cmd, env=None, cwd=None, **kw):
            class R:
                returncode = 3

            return R()

        monkeypatch.setattr(subprocess, "run", fake_run)
        try:
            ge._reexec_on_virtual_cpu_mesh(8)
        except RuntimeError as e:
            assert "rc=3" in str(e)
        else:
            raise AssertionError("expected RuntimeError on child rc!=0")

    def test_marked_child_skips_probe(self, monkeypatch):
        """With the vmesh marker set, dryrun_multichip must not probe or
        re-exec (either would recurse); it must go straight to mesh setup.
        The conftest provides 8 virtual CPU devices, but we only check the
        branch, so cut execution short at the first package import."""
        monkeypatch.setenv("_CST_DRYRUN_VMESH", "1")

        def boom(*a, **k):
            raise AssertionError("probe must not run in a marked child")

        monkeypatch.setattr(ge, "_count_devices_subprocess", boom)
        monkeypatch.setattr(ge, "_reexec_on_virtual_cpu_mesh", boom)
        monkeypatch.setattr(ge, "_tiny_scene",
                            lambda **k: (_ for _ in ()).throw(_Stop()))
        try:
            ge.dryrun_multichip(8)
        except _Stop:
            pass


class _Stop(Exception):
    pass
