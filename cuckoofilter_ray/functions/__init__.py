"""cuckoofilter_ray.functions"""
