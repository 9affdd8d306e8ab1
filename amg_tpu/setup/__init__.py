from amg_tpu.setup.hierarchy import Hierarchy, HierarchyParams, Level, build_hierarchy

__all__ = ["Hierarchy", "HierarchyParams", "Level", "build_hierarchy"]
