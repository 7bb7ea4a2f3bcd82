"""monocator_ray — a from-scratch, Ray-Data-native crawl + data-processing engine.

Reimplements the capabilities of maartenbosteels/monocator (reference stub at
/root/reference — see SURVEY.md §0) as idiomatic ray.data pipelines:
`map_batches` over zero-copy Arrow batches, actor pools for stateful stages
(URL-seen shards, frontier/politeness shards), groupby/sort/repartition for
wide steps, epoch-based (BSP) streaming frontier with checkpoint/resume.

Nothing here calls ray.init()/ray.shutdown(); sessions are owned by the
caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
