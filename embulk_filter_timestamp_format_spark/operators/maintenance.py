"""Lake-integrated corpus maintenance: near-dup sweep → delete batch.

The one training-data shape that ties the operator layer to the lake
layer: read a committed table snapshot, find near-duplicate documents
(MinHash-LSH by default — the scale path, one band-bucket shuffle), pick
canonical survivors, and commit the drops as a single op='D' batch
through the table's own ``merge_into`` — so the pass is batch-id
fenced/idempotent like any CDC batch, shows up in the changelog as
exactly the dup deletes, and costs one bucket-pruned write.

Keep policy (``keep='min'``): every near-dup pair (id_a < id_b) keeps
the smaller id; any document that is the larger side of ANY pair is
dropped. Deterministic, one distinct over the slim pair ids, no
connected-components iteration — the standard keep-first corpus-dedup
rule. It guarantees a dup-free corpus, not per-cluster
representatives: in a star through a high id (5~7, 6~7, 5!~6) it
keeps BOTH 5 and 6. ``keep='component'`` instead runs
``operators.components.connected_components`` over the pair graph and
keeps exactly the min id of every transitive cluster in one pass —
a few extra label-propagation shuffles over the slim pair ids (the
pair graph, not the corpus), in exchange for true canonical
representatives without fixpoint re-passes.

At 100 TB: the sweep reads one snapshot (immutable files, column-pruned
to id+text), the LSH shuffle moves slim (id, band, bucket) rows, the
delete batch joins the drop ids back to payloads only for the touched
buckets, and the commit rewrites/appends only those buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import minhash_lsh_pairs


def dedup_pass(
    table,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_col: str = "event_seq",
    threshold: float = 0.8,
    batch_id: "int | None" = None,
    source: str = "maintenance",
    pairs_fn=None,
    keep: str = "min",
    **lsh_kwargs,
) -> dict:
    """One corpus-dedup maintenance pass over ``table`` (any
    TableProtocol). Returns {'from_version', 'committed_version'};
    committed_version is None when nothing was dropped (empty delete
    batch commits nothing — snapshot history stays clean).

    ``pairs_fn(df) -> DataFrame[id_a, id_b, ...]`` overrides the
    default MinHash-LSH sweep (e.g. exact dedup, SimHash, or an
    embedding near-dup pass). ``keep`` picks the survivor policy:
    ``'min'`` (pairwise, see module docstring) or ``'component'``
    (per-transitive-cluster canonical via connected components)."""
    if keep not in ("min", "component"):
        raise ValueError(f"keep must be 'min' or 'component', got {keep!r}")
    from_version = table.current_version()
    df = table.read(from_version)
    if pairs_fn is not None:
        pairs = pairs_fn(df)
    else:
        pairs = minhash_lsh_pairs(
            df, id_col=id_col, text_col=text_col, threshold=threshold, **lsh_kwargs
        )
    if keep == "component":
        # per-cluster canonical: label-propagate over the slim pair
        # graph (edges only — isolated docs are their own component and
        # never drop), survivors = component minima
        from .components import connected_components

        comp = connected_components(pairs)
        drops = comp.filter(F.col("component") != F.col("node")).select(
            F.col("node").alias(id_col)
        )
    else:
        # keep='min': drop ids = distinct larger side of any pair (slim
        # two-column shuffle; the wide payload joins back only below)
        drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    # r06: materialize the slim drop set ONCE and hand it to the merge as
    # its probe — uncached, the LSH candidate+verify pipeline anchoring
    # `drops` executed twice more (once for the merge's touched-bucket
    # probe, once inside the delete-batch write), the single largest cost
    # of the corpus-dedup maintenance pass at sf1.0. Same discipline as
    # incremental_dedup_pass.
    drops = drops.persist()
    drops.count()
    # the merge reads only (key, seq) of a D row: in COW the key-match
    # deletes; in MOR the tombstone ties the base row's (key, seq) and
    # wins by side-priority (delta-D = highest class). So the drop ids
    # join back against a projection pruned to those two columns and the
    # rest of the payload rides as typed NULLs — at corpus scale the
    # delete batch never re-reads the text it is deleting (changes()
    # still reports delete PREIMAGES: it diffs snapshot read states, not
    # tombstone payloads).
    slim = [c for c in (id_col, seq_col) if c in df.columns]
    deletes = (
        df.select(*slim)
        .join(drops, id_col)
        .select(
            *slim,
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in df.schema.fields
                if f.name not in slim
            ],
        )
        .withColumn("op", F.lit("D"))
    )
    committed = table.merge_into(
        deletes, batch_id=batch_id, source=source, probe_df=drops
    )
    drops.unpersist()
    return {"from_version": from_version, "committed_version": committed}
