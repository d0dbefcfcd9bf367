"""cuckoofilter_ray.stages"""
