"""CLI surface tests: flag registry validation, --outfile/--errfile.

Reference: config/parameters/aug_cmdln_parameters.json is the canonical
flag registry (344 entries, src/properties.cc:560-605); unknown flags
print an error line but do not abort (properties.cc:589); enumerated
values are enforced.  --outfile/--errfile redirect the output streams
(augustus.cc:29-33, tests/short test_format_and_error_out).
"""

import os
import subprocess
import sys

import pytest

from conftest import REFERENCE_CONFIG, has_reference

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference config tree not available")

DATA = os.path.join(os.path.dirname(__file__), "data")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_registry_loads():
    from augustus_tpu.properties import load_registry
    reg = load_registry(REFERENCE_CONFIG + "/")
    assert reg is not None and len(reg) == 344
    assert "/augustus/verbosity" in reg


def test_unknown_flag_warns_but_continues(capsys):
    from augustus_tpu.properties import init_properties
    props = init_properties({"species": "human",
                             "AUGUSTUS_CONFIG_PATH": REFERENCE_CONFIG,
                             "definitelyNotAFlag": "1"})
    err = capsys.readouterr().err
    assert "definitelyNotAFlag is not specified" in err
    assert props.get("species") == "human"


def test_bad_enum_value_rejected():
    from augustus_tpu.properties import PropertiesError, init_properties
    with pytest.raises(PropertiesError):
        init_properties({"species": "human",
                         "AUGUSTUS_CONFIG_PATH": REFERENCE_CONFIG,
                         "genemodel": "nonsense"})


def test_bad_int_value_rejected():
    from augustus_tpu.properties import PropertiesError, init_properties
    with pytest.raises(PropertiesError):
        init_properties({"species": "human",
                         "AUGUSTUS_CONFIG_PATH": REFERENCE_CONFIG,
                         "maxDNAPieceSize": "abc"})


@pytest.mark.slow
def test_outfile_errfile(tmp_path):
    """reference test_format_and_error_out analogue."""
    outf = tmp_path / "out.gff"
    errf = tmp_path / "err.txt"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, "-m", "augustus_tpu.cli.augustus",
         "--species=human", f"--AUGUSTUS_CONFIG_PATH={REFERENCE_CONFIG}",
         "--softmasking=0", "--UTR=off", f"--outfile={outf}",
         f"--errfile={errf}", os.path.join(DATA, "HS08198.fa")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-2000:]
    assert outf.exists() and "AUGUSTUS" in outf.read_text()
    assert errf.exists()


def test_verbosity_levels(capsys, tmp_path):
    """/augustus/verbosity 0-3 gate the informational preamble
    (reference src/augustus.cc:150-220)."""
    from augustus_tpu.cli.augustus import main
    fa = tmp_path / "t.fa"
    fa.write_text(">t\n" + "acgt" * 300 + "\n")
    base = ["--species=human",
            f"--AUGUSTUS_CONFIG_PATH={REFERENCE_CONFIG}",
            "--softmasking=0", "--UTR=off", str(fa)]
    assert main(["--/augustus/verbosity=0"] + base) == 0
    out0 = capsys.readouterr().out
    assert "# No extrinsic information" not in out0
    assert main(["--/augustus/verbosity=3"] + base) == 0
    out3 = capsys.readouterr().out
    assert "# No extrinsic information on sequences given." in out3
    assert "# Initializing the parameters using config directory" in out3
    assert "is in fasta format." in out3
