import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scones.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[8]", app_name="scones-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """Deterministic synthetic corpus: 400 docs across 4 parquet files."""
    from scones.corpus import write_corpus

    d = tmp_path_factory.mktemp("corpus")
    write_corpus(str(d), n_docs=400, n_files=4, seed=42)
    return str(d)


@pytest.fixture(scope="session")
def corpus_rows():
    from scones.corpus import generate_rows

    return generate_rows(400, seed=42)


@pytest.fixture(scope="session")
def host_meta_path(tmp_path_factory):
    from scones.corpus import write_host_meta

    d = tmp_path_factory.mktemp("dims")
    return write_host_meta(str(d / "host_meta.parquet"), seed=42)
