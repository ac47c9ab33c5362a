#!/usr/bin/env python3
"""Build every degenerate-axis gate fixture from a source sfDir.

Mechanizes the pyarrow recipes the verify skill documents per axis
(SKILL.md sections 2b half through 2b-z) so a round's axis re-gate is
two commands instead of N heredocs:

    python3 tools/make_fixtures.py [src] [outroot] [axis ...]

Defaults: src=/root/testdata/sf0.001, outroot=/tmp, all axes. Axis dirs
land at <outroot>/graft_<axis>_sf (the names the skill's gate commands
use). The layout axes (shards/single/hive re-materializations) stay in
graft.LayoutGen - they exercise Spark's own writers by design - but the
COMPOSED fixtures this script builds (combo10, combo12) are the inputs
those sbt steps consume.

Recipes are byte-faithful to the per-axis sections in the skill; the
combined fixtures compose them in the documented order (mutating axes
first, duplicate-key copies appended LAST so copies stay byte-identical,
corruption appended after that for combo12). The combined TIME residues
stay spine-moderate (epoch 0 / -1 microsecond / 1969) per the round-12
design: wild enough to trip the spine guard's contract shape, bounded
enough that the gate completes.
"""
import os, sys, glob, shutil
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc
import numpy as np

US = 1000_000


def _tables(src):
    return {os.path.basename(p): pq.read_table(p)
            for p in sorted(glob.glob(f'{src}/*.parquet'))}


def _write(tabs, out):
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for n, t in tabs.items():
        pq.write_table(t, f'{out}/{n}')


def _set(t, c, arr):
    return t.set_column(t.schema.get_field_index(c), t.schema.field(c), arr)


def _setn(t, c, arr):
    # like _set but forces the field nullable (null injection)
    return t.set_column(t.schema.get_field_index(c),
                        t.schema.field(c).with_nullable(True), arr)


def onerow(tabs):
    return {n: t.slice(0, 1) for n, t in tabs.items()}


def empty(tabs):
    return {n: t.slice(0, 0) for n, t in tabs.items()}


def null(tabs):
    tabs = dict(tabs)

    def nullify(t, c, key, m, r):
        v = t[key].combine_chunks().to_numpy()
        mask = pa.array((v % m) == r)
        a = t[c].combine_chunks()
        return _setn(t, c, pc.if_else(mask, pa.nulls(len(t), a.type), a))

    tabs['documents.parquet'] = nullify(tabs['documents.parquet'], 'text', 'doc_id', 13, 3)
    e = tabs['events.parquet']
    e = nullify(e, 'props', 'event_id', 11, 5)
    e = nullify(e, 'value', 'event_id', 7, 2)
    tabs['events.parquet'] = e
    tabs['embeddings.parquet'] = nullify(tabs['embeddings.parquet'], 'embedding', 'vec_id', 17, 2)
    return tabs


def nonfinite(tabs):
    tabs = dict(tabs)
    t = tabs['events.parquet']
    ev = t['event_id'].combine_chunks().to_numpy()
    v = t['value'].combine_chunks().to_numpy(zero_copy_only=False).copy()
    v[ev % 19 == 4] = np.nan
    v[ev % 23 == 7] = np.inf
    v[ev % 29 == 11] = -np.inf
    v[ev % 37 == 5] = 1e20
    v[ev % 41 == 7] = -3.7e18
    v[ev % 43 == 13] = 1e16
    v[ev % 47 == 9] = 5.4321e9  # in money range, beyond share-quant 2^53
    tabs['events.parquet'] = _set(t, 'value', pa.array(v))
    t = tabs['embeddings.parquet']
    vid = t['vec_id'].combine_chunks().to_numpy()
    emb = t['embedding'].combine_chunks()
    lists = emb.to_pylist()
    for i, vi in enumerate(vid):
        if vi % 19 == 4 and lists[i]:
            lists[i][0] = float('nan')
        if vi % 23 == 7 and len(lists[i] or []) > 1:
            lists[i][1] = float('inf')
        if vi % 29 == 3 and len(lists[i] or []) > 2:
            lists[i][2] = None
    tabs['embeddings.parquet'] = _set(t, 'embedding', pa.array(lists, type=emb.type))
    return tabs


# UnicodeTextSpec's doc_id%31 residues, pyarrow spelling
_EMO_A = "\U0001F469‍\U0001F680"  # woman astronaut (ZWJ)
_EMO_B = "\U0001F680\U0001F468‍\U0001F469‍\U0001F467"  # rocket + family


def unicode_text(tabs):
    tabs = dict(tabs)
    t = tabs['documents.parquet']
    ids = t['doc_id'].combine_chunks().to_numpy()
    texts = t['text'].combine_chunks().to_pylist()
    out = []
    for i, txt in zip(ids, texts):
        r = i % 31
        if txt is None:
            out.append(None)
        elif r == 1:
            out.append("İstanbul straße " + txt + " ΣΟΦΟΣ DESS")
        elif r == 5:
            out.append("　  " + txt.replace(",", ",　") + "  　")
        elif r == 9:
            out.append(_EMO_A + " " + txt + " " + _EMO_B)
        elif r == 13:
            out.append("café " + txt + " élève")
        elif r == 17:
            out.append("tab\there " + txt + " zero​width")
        elif r == 21:
            out.append(txt + " with\nembedded\nnewlines\r\nand cr")
        elif r == 25:
            out.append("　 ​")
        else:
            out.append(txt)
    tabs['documents.parquet'] = _setn(t, 'text', pa.array(out, type=pa.string()))
    return tabs


def _us(iso):
    import datetime
    return int(datetime.datetime.fromisoformat(iso).replace(
        tzinfo=datetime.timezone.utc).timestamp()) * US


_NS_MIN_US = -9223372036854776 + 7
_NS_MAX_US = 9223372036854775 - 7


def _ts_surgery(t, col, key, m, residues):
    keyv = t[key].combine_chunks().to_numpy()
    unit = t[col].type.unit
    assert unit == 'us', f'{col} unit {unit}'
    ts = t[col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False).copy()
    for r, val in residues.items():
        ts[keyv % m == r] = val
    return _set(t, col, pa.array(ts, type=pa.int64()).cast(t[col].type))


def timeext(tabs, moderate=False):
    tabs = dict(tabs)
    ev_res = {11: 0, 17: -1, 23: _us('1969-07-20T20:17:40') + 123456}
    if not moderate:
        ev_res.update({29: _NS_MIN_US, 31: _NS_MAX_US,
                       37: _us('2196-02-29T23:59:59') + 999999,
                       41: _us('1900-01-01T00:00:00')})
    tabs['events.parquet'] = _ts_surgery(tabs['events.parquet'], 'ts', 'event_id', 53, ev_res)
    if not moderate:
        od_res = {13: _us('1901-12-13T00:00:00'),
                  19: _us('2262-04-11T00:00:00'), 23: -1}
        tabs['orders.parquet'] = _ts_surgery(
            tabs['orders.parquet'], 'o_orderdate', 'o_orderkey', 59, od_res)
    return tabs


def collapse(tabs):
    tabs = dict(tabs)
    t = tabs['events.parquet']
    n = len(t)
    t = _set(t, 'user_id', pa.array([7] * n, type=pa.int64()))
    t = _set(t, 'ts', pa.array([1705320000000000] * n, type=pa.int64()).cast(t['ts'].type))
    tabs['events.parquet'] = t
    t = tabs['documents.parquet']
    ids = t['doc_id'].combine_chunks().to_pylist()
    texts = t['text'].combine_chunks().to_pylist()
    tmpl = texts[ids.index(min(ids))]
    tabs['documents.parquet'] = _set(t, 'text', pa.array([tmpl] * len(t), type=pa.string()))
    return tabs


def dimdrift(tabs):
    tabs = dict(tabs)
    t = tabs['embeddings.parquet']
    vid = t['vec_id'].combine_chunks().to_numpy()
    emb = t['embedding'].combine_chunks()
    lists = emb.to_pylist()
    for i, vi in enumerate(vid):
        if lists[i] is None:
            continue
        if vi % 31 == 4:
            lists[i] = [0.0] * 64               # padding row
        if vi % 37 == 5:
            lists[i] = lists[i][:32]            # old-model width
        if vi % 41 == 11:
            lists[i] = lists[i] + lists[i][:32]  # new-model width
        if vi % 43 == 17:
            lists[i] = []                        # failed encode
        if vi % 47 == 23:
            lists[i] = lists[i][:63]             # off-by-one
    tabs['embeddings.parquet'] = _set(t, 'embedding', pa.array(lists, type=emb.type))
    return tabs


_DUP_RULES = {'events.parquet': ('event_id', 9, 2),
              'documents.parquet': ('doc_id', 11, 3),
              'embeddings.parquet': ('vec_id', 13, 5),
              'orders.parquet': ('o_orderkey', 17, 7),
              'lineitem.parquet': ('l_orderkey', 19, 4)}


def dupkey(tabs):
    out = {}
    for n, t in tabs.items():
        if n in _DUP_RULES:
            k, m, r = _DUP_RULES[n]
            v = t[k].combine_chunks().to_numpy()
            t = pa.concat_tables([t, t.filter(pa.array((v % m) == r))])
        out[n] = t
    return out


def keycorrupt(tabs, shift_ts=True):
    out = dict(tabs)
    t = tabs['documents.parquet']
    m = (t['doc_id'].combine_chunks().to_numpy() % 23) == 11
    extra = t.filter(pa.array(m))
    txt = [None if s is None else s + ' zz corrupted variant payload'
           for s in extra['text'].combine_chunks().to_pylist()]
    extra = _setn(extra, 'text', pa.array(txt, type=pa.string()))
    out['documents.parquet'] = pa.concat_tables([t, extra])

    t = tabs['embeddings.parquet']
    m = (t['vec_id'].combine_chunks().to_numpy() % 29) == 13
    extra = t.filter(pa.array(m))
    emb = extra['embedding'].combine_chunks()
    rev = pa.array([None if l is None else l[::-1] for l in emb.to_pylist()], type=emb.type)
    extra = _set(extra, 'embedding', rev)
    out['embeddings.parquet'] = pa.concat_tables([t, extra])

    t = tabs['events.parquet']
    m = (t['event_id'].combine_chunks().to_numpy() % 31) == 17
    extra = t.filter(pa.array(m))
    v = extra['value'].combine_chunks().to_numpy(zero_copy_only=False) + 1000.0
    extra = _setn(extra, 'value', pa.array(v))
    if shift_ts:
        ts = extra['ts'].combine_chunks().cast(pa.int64()).to_numpy() + 3600 * US
        extra = _set(extra, 'ts', pa.array(ts, type=pa.int64()).cast(t['ts'].type))
    out['events.parquet'] = pa.concat_tables([t, extra])

    t = tabs['orders.parquet']
    m = (t['o_orderkey'].combine_chunks().to_numpy() % 37) == 19
    extra = t.filter(pa.array(m))
    v = extra['o_totalprice'].combine_chunks().to_numpy(zero_copy_only=False) + 1.0
    extra = _set(extra, 'o_totalprice', pa.array(v))
    out['orders.parquet'] = pa.concat_tables([t, extra])
    return out


def combo10(tabs):
    # mutating axes first, duplicate-key copies appended LAST
    t = null(tabs)
    t = nonfinite(t)
    t = unicode_text(t)
    t = timeext(t, moderate=True)
    t = dimdrift(t)
    return dupkey(t)


_EVO_LATE = {'documents.parquet': 'source', 'events.parquet': 'props'}


def write_schemaevo(tabs, out):
    """Schema-evolution axis (thirteenth): the late column is absent from
    the OLDER file of a two-file table dir — written before the column
    existed — and present with real values in the newer one. Old-file
    rows must surface the column as NULL on both engines; single-footer
    schema inference would silently drop the new file's values whenever
    listing order picks the old footer first (the dir is named so the
    old file sorts FIRST)."""
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for n, t in tabs.items():
        if n in _EVO_LATE:
            d = f'{out}/{n}'
            os.makedirs(d, exist_ok=True)
            half = len(t) // 2
            old = t.slice(0, half).drop_columns([_EVO_LATE[n]])
            pq.write_table(old, f'{d}/part-000-old-schema.parquet')
            pq.write_table(t.slice(half), f'{d}/part-001-new-schema.parquet')
        else:
            pq.write_table(t, f'{out}/{n}')


_WIDTH_NARROW = {'documents.parquet': ['doc_id', 'n_chars'],
                 'events.parquet': ['event_id', 'user_id']}


def write_widthevo(tabs, out):
    """Width-evolution axis (fourteenth): key columns widened mid-lake —
    the OLDER file carries int32, the newer int64 for the same columns.
    Footer-union inference CANNOT merge these; the engine's declared-
    schema fallback (and DuckDB's union_by_name promotion) must."""
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for n, t in tabs.items():
        if n in _WIDTH_NARROW:
            d = f'{out}/{n}'
            os.makedirs(d, exist_ok=True)
            half = len(t) // 2
            old = t.slice(0, half)
            for c in _WIDTH_NARROW[n]:
                old = old.set_column(
                    old.schema.get_field_index(c), pa.field(c, pa.int32()),
                    old[c].combine_chunks().cast(pa.int32()))
            pq.write_table(old, f'{d}/part-000-old-width.parquet')
            pq.write_table(t.slice(half), f'{d}/part-001-new-width.parquet')
        else:
            pq.write_table(t, f'{out}/{n}')


def combo12(tabs):
    # corruption appended after the duplicate-key copies
    return keycorrupt(combo10(tabs))


def write_dirty(tabs, out):
    """Dirty-directory axis (fifteenth): every table becomes a two-file
    dir polluted with the junk a live lake accumulates — a _SUCCESS
    marker, a hidden .crc shadow, a hidden garbage .parquet-named
    dotfile, a stray text file, a half-renamed writer temp
    (*.parquet.tmp), and a _temporary job dir. The engine surface must
    be byte-identical to the clean dir: the read contract is exactly
    non-hidden `*.parquet` files (T.apply pathGlobFilter; the oracle's
    Python-globbed list mirrors it). Measured before the contract
    landed: Spark died on the stray text file's footer, DuckDB's own
    glob matched the hidden dotfile and died on its magic bytes.

    The .crc shadow is ORPHANED (names a data file that no longer
    exists — the post-compaction leftover): Hadoop's LocalFileSystem is
    a ChecksumFileSystem and a .crc naming an EXISTING data file is an
    ACTIVE integrity sidecar, not junk — a garbage one fails the read
    loudly (measured: EOFException through FSInputChecker), which is
    the correct boundary (DirtyDirSpec pins it), same class as a
    zero-byte x.parquet."""
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for n, t in tabs.items():
        d = f'{out}/{n}'
        os.makedirs(d, exist_ok=True)
        half = max(1, len(t) // 2)
        pq.write_table(t.slice(0, half), f'{d}/part-000.parquet')
        pq.write_table(t.slice(half), f'{d}/part-001.parquet')
        open(f'{d}/_SUCCESS', 'w').close()
        with open(f'{d}/.part-999.parquet.crc', 'wb') as f:
            f.write(b'\x00garbage-crc-shadow')
        with open(f'{d}/.hidden.parquet', 'wb') as f:
            f.write(b'PAR1 hidden garbage, not a footer')
        with open(f'{d}/README.txt', 'w') as f:
            f.write('stray notes file beside the data\n')
        with open(f'{d}/part-002.parquet.tmp', 'wb') as f:
            f.write(b'PAR1 half-renamed writer temp')
        os.makedirs(f'{d}/_temporary/0', exist_ok=True)
        with open(f'{d}/_temporary/0/task-tmp.parquet', 'wb') as f:
            f.write(b'PAR1 in-flight task output')


def write_encdrift(tabs, out):
    """Physical-encoding drift axis (sixteenth): one table dir mixes
    files written by different writers over time — zstd, gzip, snappy
    with pathological 7-row row groups, and uncompressed parquet data
    page v2 with dictionary encoding off. Codec and page layout are
    writer accidents a 100 TB lake never keeps uniform; the logical
    surface must be byte-identical to the clean dir on both engines."""
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for n, t in tabs.items():
        d = f'{out}/{n}'
        os.makedirs(d, exist_ok=True)
        q = max(1, len(t) // 4)
        pq.write_table(t.slice(0, q), f'{d}/p0.parquet', compression='zstd')
        pq.write_table(t.slice(q, q), f'{d}/p1.parquet', compression='gzip')
        pq.write_table(t.slice(2 * q, q), f'{d}/p2.parquet',
                       compression='snappy', row_group_size=7)
        pq.write_table(t.slice(3 * q), f'{d}/p3.parquet', compression='none',
                       use_dictionary=False, data_page_version='2.0')


def write_encdrift2(tabs, out):
    """Codec/row-group drift axis (seventeenth): the harsher sibling of
    encdrift — per-file COLUMN-ORDER permutation (two writers, two
    select orders: parquet resolves columns by name, but a reader that
    trusted physical position would silently transpose), LZ4_RAW (the
    codec parquet standardized after the hadoop-framed LZ4 mess — a
    newer-writer file in an older dir), 1-row row groups with 64-byte
    data pages (a streaming writer flushing per record — maximal
    per-row-group overhead), and the two drifts COMPOSED in one file
    (reversed order + uncompressed + dictionary off + page v2). The
    logical surface must be byte-identical to the clean dir."""
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for n, t in tabs.items():
        d = f'{out}/{n}'
        os.makedirs(d, exist_ok=True)
        q = max(1, len(t) // 4)
        rev = list(reversed(t.column_names))
        pq.write_table(t.slice(0, q), f'{d}/p0.parquet', compression='lz4')
        pq.write_table(t.slice(q, q).select(rev), f'{d}/p1.parquet')
        pq.write_table(t.slice(2 * q, q), f'{d}/p2.parquet',
                       compression='zstd', row_group_size=1,
                       data_page_size=64)
        pq.write_table(t.slice(3 * q).select(rev), f'{d}/p3.parquet',
                       compression='none', use_dictionary=False,
                       data_page_version='2.0')


def write_combo14(tabs, out):
    """Fourteen-layer composition: the combo12 ROW-level degeneracies
    (nulls, non-finite, magnitudes, unicode, moderate wild clocks,
    collapse residues, dim drift, duplicate keys, key corruption) re-
    materialized through the PHYSICAL-layer axes — each table as a
    mixed-codec multi-file dir (encdrift's zstd/gzip/snappy+7-row-
    groups/uncompressed-v2 split) polluted with the dirty-directory
    junk. Same expected shape as combo12: the two spine-guard FAILs,
    everything else green."""
    comp = combo12(tabs)
    write_encdrift(comp, out)
    for n in comp:
        d = f'{out}/{n}'
        open(f'{d}/_SUCCESS', 'w').close()
        with open(f'{d}/.part-999.parquet.crc', 'wb') as f:
            f.write(b'\x00garbage-crc-shadow')
        with open(f'{d}/.hidden.parquet', 'wb') as f:
            f.write(b'PAR1 hidden garbage, not a footer')
        with open(f'{d}/README.txt', 'w') as f:
            f.write('stray notes file beside the data\n')
        with open(f'{d}/p9.parquet.tmp', 'wb') as f:
            f.write(b'PAR1 half-renamed writer temp')
        os.makedirs(f'{d}/_temporary/0', exist_ok=True)
        with open(f'{d}/_temporary/0/task-tmp.parquet', 'wb') as f:
            f.write(b'PAR1 in-flight task output')


AXES = {
    'onerow': onerow,
    'empty': empty,
    'null': null,
    'nonfinite': nonfinite,
    'unicode': unicode_text,
    'timeext': timeext,
    'collapse': collapse,
    'dimdrift': dimdrift,
    'dupkey': dupkey,
    'keycorrupt': keycorrupt,
    'keycorrupt2': lambda t: keycorrupt(t, shift_ts=False),  # same-ts variant
    'combo10': combo10,
    'combo12': combo12,
    'schemaevo': None,  # dir-structured writer, see write_schemaevo
    'widthevo': None,   # dir-structured writer, see write_widthevo
    'dirty': None,      # dir-structured writer, see write_dirty
    'encdrift': None,   # dir-structured writer, see write_encdrift
    'encdrift2': None,  # dir-structured writer, see write_encdrift2
    'combo14': None,    # dir-structured writer, see write_combo14
}


def main():
    args = sys.argv[1:]
    src = args[0] if args else '/root/testdata/sf0.001'
    outroot = args[1] if len(args) > 1 else '/tmp'
    names = args[2:] if len(args) > 2 else list(AXES)
    base = _tables(src)
    for name in names:
        out = f'{outroot}/graft_{name}_sf'
        if name == 'schemaevo':
            write_schemaevo(base, out)
        elif name == 'widthevo':
            write_widthevo(base, out)
        elif name == 'dirty':
            write_dirty(base, out)
        elif name == 'encdrift':
            write_encdrift(base, out)
        elif name == 'encdrift2':
            write_encdrift2(base, out)
        elif name == 'combo14':
            write_combo14(base, out)
        else:
            _write(AXES[name](base), out)
        print(f'{name}: {out}')


if __name__ == '__main__':
    main()
