"""Ray-Data pipeline layer: sources, stages, pipelines, shuffle, checkpoints.

Everything here drives the pure-numpy kernels in ``engine.geo`` through
``ray.data.Dataset`` transforms (map_batches over zero-copy Arrow, actor
pools for stateful stages, groupby/sort shuffles).  No module in this
package calls ``ray.init`` — sessions are owned by the driver, bench.py
or the test fixture (driver contract in ``__ray_entry__``).
"""
