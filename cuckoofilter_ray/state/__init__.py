"""cuckoofilter_ray.state"""
