"""Model-based fuzz of the merge-on-read store: a random sequence of
write / merge(upsert+delete) / compact operations is applied both to the
store and to a plain Python dict model; after every operation the
store's read() must equal the model, and every retained historical
version must equal its recorded model snapshot (time-travel holds under
arbitrary op interleavings — the property the unit tests sample only
pointwise)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vector_graph_rag_spark.sources.versioned import VersionedCorpus

KEYS = list(range(8))

# an op is ("write", {k: v}) | ("merge", {k: v|None}) | ("compact",)
_write = st.dictionaries(
    st.sampled_from(KEYS), st.text(alphabet="abcxyz", min_size=1, max_size=4),
    min_size=1, max_size=6,
).map(lambda d: ("write", d))
_merge = st.dictionaries(
    st.sampled_from(KEYS),
    st.one_of(st.none(), st.text(alphabet="abcxyz", min_size=1, max_size=4)),
    min_size=1, max_size=5,
).map(lambda d: ("merge", d))
_compact = st.just(("compact",))
_ops = st.lists(
    st.one_of(_write, _merge, _compact), min_size=1, max_size=6
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops)
def test_store_matches_dict_model_under_random_ops(spark, tmp_path_factory, ops):
    store = VersionedCorpus(
        spark, str(tmp_path_factory.mktemp("fuzz") / "corpus")
    )
    model: dict[int, str] = {}
    snapshots: dict[int, dict[int, str]] = {}

    def df_of(d, with_del=False):
        if with_del:
            rows = [(k, v, v is None) for k, v in d.items()]
            return spark.createDataFrame(
                rows, "doc_id long, text string, is_delete boolean"
            )
        return spark.createDataFrame(
            list(d.items()), "doc_id long, text string"
        )

    for op in ops:
        if op[0] == "write":
            model = dict(op[1])
            v = store.write(df_of(op[1]))
        elif op[0] == "merge":
            if store.latest_version() == 0:
                # bootstrap path: deletes drop, inserts land
                model = {k: v for k, v in op[1].items() if v is not None}
            else:
                for k, val in op[1].items():
                    if val is None:
                        model.pop(k, None)
                    else:
                        model[k] = val
            v = store.merge(df_of(op[1], with_del=True), delete_col="is_delete")
        else:
            if store.latest_version() == 0:
                continue  # nothing to compact yet
            v = store.compact()
        snapshots[v] = dict(model)
        got = {r["doc_id"]: r["text"] for r in store.read().collect()}
        assert got == model, (op, got, model)
    # time travel: every retained version equals its snapshot
    for v, snap in snapshots.items():
        got_v = {r["doc_id"]: r["text"] for r in store.read(v).collect()}
        assert got_v == snap, (v, got_v, snap)
