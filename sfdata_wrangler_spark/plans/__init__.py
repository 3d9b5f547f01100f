from . import catalog as _catalog  # registers relational queries
from . import catalog2 as _catalog2  # registers wave-2 queries
from . import catalog3 as _catalog3  # registers wave-3 queries
from . import catalog4 as _catalog4  # registers wave-4 queries
from . import catalog5 as _catalog5  # registers pipeline-fixture queries
from . import catalog6 as _catalog6  # registers tokenization/array analytics
from . import catalog7 as _catalog7  # registers S1/J5/J8/W13 oracle twins
from . import catalog_text as _catalog_text  # registers text/embedding queries
from . import catalog8 as _catalog8  # registers round-3 real-codec/recall queries
from . import catalog9 as _catalog9  # registers skew/sink/bucketing queries
from . import catalog10 as _catalog10  # registers curation ops (r4 sweep queue)
from . import catalog11 as _catalog11  # registers retrieval/mixture queries
from . import catalog12 as _catalog12  # registers LM/linedup/incremental-dedup
from . import catalog13 as _catalog13  # registers trained-BPE queries
from . import catalog14 as _catalog14  # registers quality-distill classifier
from . import catalog15 as _catalog15  # registers SCD2 + table profiling
from . import catalog16 as _catalog16  # registers curation pipeline v3
from . import catalog17 as _catalog17  # registers embedding PCA
from . import catalog18 as _catalog18  # registers remaining TPC-H shapes
from . import catalog19 as _catalog19  # registers round-4 operator waves
from . import catalog20 as _catalog20  # registers HLL/bloom/graph/CDC/compaction
from . import catalog21 as _catalog21  # registers EWMA/drift QC/sink roundtrips/ER/patches
from . import catalog22 as _catalog22  # registers attribution/resample/containment
from . import catalog23 as _catalog23  # registers exact pair search + QC diagnostics
from . import catalog24 as _catalog24  # registers two-stage retrieval rerank
from . import catalog25 as _catalog25  # registers zonemap/FK/SCD2/CUSUM backlog
from . import catalog26 as _catalog26  # registers tfidf/AB/LOO/PPS/overlap backlog
from . import catalog27 as _catalog27  # registers the dataset-level demand ingest
from . import catalog28 as _catalog28  # registers the quantile-sketch queries
from . import catalog29 as _catalog29  # registers ingest-robustness sources
from . import catalog30 as _catalog30  # registers perceptual-hash image dedup
from . import catalog31 as _catalog31  # registers the web-tier curation pipeline
from . import catalog32 as _catalog32  # registers r4 pre-built operator oracles
from . import catalog33 as _catalog33  # registers the S11 viz-ramp oracle
from . import catalog34 as _catalog34  # registers round-6 wave (episodes, reservoir, benford, woe, lsh-calib)
from . import catalog35 as _catalog35  # registers round-7 wave (IVF-PQ composed ANN)
from . import catalog36 as _catalog36  # registers round-8 wave (privacy, NFKC fixture, IVF-PQ lake)
from . import catalog37 as _catalog37  # registers round-9 wave (trained-quantizer IVF-PQ)
from . import catalog38 as _catalog38  # registers round-10 wave (end-to-end pipeline runner)
from .catalog import QUERIES, oracle_sql_map, query_map

__all__ = ["QUERIES", "oracle_sql_map", "query_map"]
