import pytest

from hemera_indexer_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hemera-tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_log(tmp_path_factory):
    """Deterministic tiny change log: 1k docs / ~8 epochs, with skew,
    duplicates, shuffled delivery, a rollback and mid-stream schema
    evolution (FIXTURES.md 'tiny' scale)."""
    from hemera_indexer_spark.sources.generator import ChangelogSpec, generate_changelog

    out = str(tmp_path_factory.mktemp("changelog"))
    spec = ChangelogSpec(
        n_docs=500,
        n_epochs=8,
        events_per_epoch=800,
        n_partitions=4,
        seed=42,
        schema_evolution_epoch=5,
        rollback_epochs=(6,),
    )
    gen = generate_changelog(out, spec)
    return gen
