"""cuckoofilter_ray.sources"""
