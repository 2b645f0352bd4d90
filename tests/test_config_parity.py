"""Config-tree parity against the reference.

Two guarantees (red on config drift, round-3 verdict item 6):

1. Every config file in /root/reference/configs/** loads to the SAME merged
   dict through this repo's loader as through the reference's own
   src/config.py (imported and executed) — the inherit_from chain, deep
   merge, and default fallback are behaviorally identical.
2. Every reference config has a same-relative-path counterpart in this
   repo's configs/, and the counterpart preserves every reference key with
   an equal value (repo configs may ADD keys — e.g. parallel/telemetry
   extensions — but may not drop or alter reference ones). Documented
   exceptions: machine-local paths.
"""

import glob
import os

import pytest

import ref_shims

if not ref_shims.reference_available():
    pytest.skip("/root/reference not present", allow_module_level=True)

ref_shims.install()

from src import config as ref_config  # noqa: E402

from evennicer_slam_tpu.config import load_config  # noqa: E402

REF_ROOT = "/root/reference"
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REF_CONFIGS = sorted(
    os.path.relpath(p, REF_ROOT)
    for p in glob.glob(f"{REF_ROOT}/configs/**/*.yaml", recursive=True)
)

# keys whose values are machine-local paths or repo-specific artifacts and
# may legitimately differ between the two trees
_VALUE_EXEMPT = {
    ("data", "input_folder"),
    ("data", "event_folder"),
    ("data", "output"),
    ("event", "pretrained_path"),
    ("pretrained_decoders", "coarse"),
    ("pretrained_decoders", "middle_fine"),
}


def _default_for(rel):
    # run.py picks nice_slam.yaml unless --imap (reference run.py:32-39);
    # the mode defaults themselves have no default_path
    if rel.endswith(("nice_slam.yaml", "imap.yaml")):
        return None
    return "configs/nice_slam.yaml"


def _flatten(d, prefix=()):
    out = {}
    for k, v in d.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


class TestLoaderBehaviorParity:
    @pytest.mark.parametrize("rel", REF_CONFIGS)
    def test_reference_tree_loads_identically(self, rel, monkeypatch):
        """Repo loader vs the reference's src/config.py on the reference's
        own config tree: identical merged dicts."""
        monkeypatch.chdir(REF_ROOT)  # inherit_from paths are CWD-relative
        default = _default_for(rel)
        theirs = ref_config.load_config(
            rel, default or rel
        ) if default else ref_config.load_config(rel, rel)
        ours = load_config(rel, default)
        theirs.pop("inherit_from", None)
        ours.pop("inherit_from", None)
        assert ours == theirs, f"loader divergence on {rel}"


class TestConfigTreeParity:
    def test_every_reference_config_has_counterpart(self):
        missing = [
            rel for rel in REF_CONFIGS
            if not os.path.exists(os.path.join(REPO_ROOT, rel))
        ]
        assert not missing, f"missing repo counterparts: {missing}"

    @pytest.mark.parametrize("rel", REF_CONFIGS)
    def test_counterpart_preserves_reference_keys(self, rel, monkeypatch):
        """The fully-merged repo config contains every fully-merged reference
        key with an equal value (path-valued keys exempt)."""
        monkeypatch.chdir(REF_ROOT)
        default = _default_for(rel)
        theirs = _flatten(
            ref_config.load_config(rel, default or rel)
        )
        monkeypatch.chdir(REPO_ROOT)
        ours = _flatten(load_config(rel, default))
        problems = []
        for key, val in theirs.items():
            if key == ("inherit_from",) or key in _VALUE_EXEMPT:
                continue
            if key not in ours:
                problems.append(f"missing {'.'.join(key)}")
            elif ours[key] != val:
                problems.append(
                    f"{'.'.join(key)}: repo={ours[key]!r} ref={val!r}"
                )
        assert not problems, f"{rel}: " + "; ".join(problems)
