"""Guard for the driver's multichip dry-run path: one full shard_map DP
train step on the 8 fake CPU devices (SURVEY.md §4.3; __graft_entry__)."""

import sys


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)   # raises on any sharding error
