"""cuckoofilter_ray.pipelines"""
