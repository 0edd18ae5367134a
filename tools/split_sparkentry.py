#!/usr/bin/env python3
"""Mechanical split of SparkEntry.scala into graft.queries.* family
modules (VERDICT r6 item 7). Entry text is moved verbatim; SparkEntry
merges the family maps back into the single driver contract."""
import re, sys, os

SRC = 'src/main/scala/graft/SparkEntry.scala'
OUT = 'src/main/scala/graft/queries'
src = open(SRC).read().split('\n')

qdef = next(i for i, l in enumerate(src) if l.startswith('  def queries:'))
odef = next(i for i, l in enumerate(src) if l.startswith('  def oracleSql:'))
def mapend(start):
    for i in range(start + 1, len(src)):
        if src[i] == '  )':
            return i
qend, oend = mapend(qdef), mapend(odef)

ENT = re.compile(r'^    "([a-z0-9_]+)" ->( |$)')

def entries(start, end):
    """[(name, slice_lines)] partitioning src[start:end] completely."""
    idx = [(i, ENT.match(src[i]).group(1)) for i in range(start, end)
           if ENT.match(src[i])]
    # attach each entry's immediately-preceding comment block
    starts = []
    for i, name in idx:
        j = i
        while j - 1 >= start and src[j - 1].lstrip().startswith('//'):
            j -= 1
        starts.append((j, name))
    # leading residue (should be empty or blank) goes to first slice
    out = []
    bounds = [s for s, _ in starts] + [end]
    if starts and starts[0][0] != start:
        residue = src[start:starts[0][0]]
        assert all(not l.strip() for l in residue), residue
    for k, (s, name) in enumerate(starts):
        lo = start if k == 0 else s
        out.append((name, src[lo:bounds[k + 1]]))
    return out

qentries = entries(qdef + 1, qend)
oentries = entries(odef + 1, oend)
assert len(qentries) == 395 and len(oentries) == 393, \
    (len(qentries), len(oentries))
# losslessness: concatenation reproduces the regions exactly
assert sum((e[1] for e in qentries), []) == src[qdef + 1:qend]
assert sum((e[1] for e in oentries), []) == src[odef + 1:oend]

MODULES = {
    'TsQueries': {'ts'},
    'AggQueries': {'agg'},
    'TextSimQueries': {'text', 'dedup', 'sim', 'emb'},
    'GraphOlapQueries': {'graph', 'olap', 'mine', 'sketch', 'layout',
                         'link'},
    'StreamIngestQueries': {'stream', 'ingest', 'inc', 'wm', 'cal', 'dq',
                            'source', 'json', 'sql'},
}
def module_of(name):
    fam = name.split('_')[0]
    for m, fams in MODULES.items():
        if fam in fams:
            return m
    return 'WarehouseQueries'

mods = list(MODULES) + ['WarehouseQueries']
qby = {m: [] for m in mods}
oby = {m: [] for m in mods}
for n, sl in qentries: qby[module_of(n)].append(sl)
for n, sl in oentries: oby[module_of(n)].append(sl)

HEADER = '''package graft
package queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.CacheRegistry.QueryCached
import graft.cal.BusdayCount
import graft.dedup.{MinHash, NgramJaccard, SimHash}
import graft.inc.Watermark
import graft.ingest.AvJson
import graft.olap.{Exact, Skyline}
import graft.similarity.Similarity
import graft.text.TextAnalysis
import graft.ts.{Indicators, Intervals, Ohlc}
import Shared._
'''

DOCS = {
    'TsQueries': 'Time-series (ts_*) family',
    'AggQueries': 'Statistical aggregate (agg_*) family',
    'TextSimQueries':
        'Text analysis, dedup, similarity and embedding families',
    'GraphOlapQueries': 'Graph, OLAP, mining, sketch and layout families',
    'StreamIngestQueries':
        'Streaming, ingest, incremental, watermark, calendar and DQ families',
    'WarehouseQueries':
        'Warehouse surface: sampling, multimodal, joins, windows, packing '
        'and the composed pipelines',
}

os.makedirs(OUT, exist_ok=True)
for m in mods:
    body = [HEADER]
    body.append('/** %s — query + oracle definitions, mechanically split' % DOCS[m])
    body.append('  * out of SparkEntry (round 7, VERDICT r6 item 7): entry text is')
    body.append('  * verbatim, zero behavior change; SparkEntry merges the family maps')
    body.append('  * back into the single driver contract.')
    body.append('  */')
    body.append('object %s {' % m)
    body.append('')
    body.append('  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(')
    for sl in qby[m]:
        body.extend(sl)
    body.append('  )')
    body.append('')
    body.append('  val oracles: Map[String, String] = Map(')
    for sl in oby[m]:
        body.extend(sl)
    body.append('  )')
    body.append('}')
    open(os.path.join(OUT, m + '.scala'), 'w').write('\n'.join(body) + '\n')
    print(m, 'queries', len(qby[m]), 'oracles', len(oby[m]),
          'lines', len(body))

# Shared helpers: between-maps region (minus oracleSql's scaladoc) and
# the trailing region (minus the object's closing brace)
j = odef - 1
while not src[j].strip():
    j -= 1
if src[j].strip().endswith('*/'):
    while not src[j].lstrip().startswith('/**'):
        j -= 1
odoc_start = j
helpers = src[qend + 1:odoc_start] + src[oend + 1:len(src) - 2]
# last line of file is '' after final '}'? verify
assert src[-1] == '' and src[-2] == '}', src[-3:]
helpers = [re.sub(r'^(\s*)private ', r'\1', l) for l in helpers]
shared = [HEADER.replace('import Shared._\n', '')]
shared.append('/** Helper frames and DuckDB SQL fragments shared across the')
shared.append('  * graft.queries.* family modules — formerly SparkEntry privates,')
shared.append('  * moved verbatim in the round-7 mechanical split.')
shared.append('  */')
shared.append('object Shared {')
shared.extend(helpers)
shared.append('}')
open(os.path.join(OUT, 'Shared.scala'), 'w').write('\n'.join(shared) + '\n')
print('Shared lines', len(shared))

# New slim SparkEntry: header..qdef's scaladoc replaced by merge defs
# find queries scaladoc start (walk back from qdef)
j = qdef - 1
while not src[j].strip():
    j -= 1
if src[j].strip().endswith('*/'):
    while not src[j].lstrip().startswith('/**'):
        j -= 1
qdoc_start = j
entry_part = src[:qdoc_start]
merge = '''  /** One entry per implemented operator from SURVEY.md §2 — definitions
    * live in the graft.queries.* family modules (mechanical split, round
    * 7); merged here so the driver contract is unchanged.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.TsQueries.queries ++
      graft.queries.AggQueries.queries ++
      graft.queries.TextSimQueries.queries ++
      graft.queries.GraphOlapQueries.queries ++
      graft.queries.StreamIngestQueries.queries ++
      graft.queries.WarehouseQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.TsQueries.oracles ++
      graft.queries.AggQueries.oracles ++
      graft.queries.TextSimQueries.oracles ++
      graft.queries.GraphOlapQueries.oracles ++
      graft.queries.StreamIngestQueries.oracles ++
      graft.queries.WarehouseQueries.oracles
}
'''
open(SRC, 'w').write('\n'.join(entry_part) + '\n' + merge)
print('new SparkEntry lines', len(entry_part) + merge.count('\n') + 1)
